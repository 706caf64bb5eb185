"""Index persistence: versioned whole-index snapshots.

The reference serializes its graph to EDN text (helper/index_io.clj:10-39
save, :41-80 load; ~493 MB for 31k vectors) and does NOT serialize the
distance function — the caller must re-supply it (index_io.clj:41-43), which
its own integration tests get wrong (SURVEY.md §2.9). Here every index is a
set of dense arrays, so persistence is one compressed .npz with a versioned
JSON header that DOES record the metric, the family and all build params —
load needs nothing but the path.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

FORMAT_VERSION = 1


def save_index(index, path: str) -> str:
    """Snapshot an index (PersistableIndex analogue, protocol.clj:43-56)."""
    from hnsw_tpu.models import INDEX_CLASSES  # noqa: F401 (validates family)

    state = index.to_state()
    corpus = index.corpus
    header = {
        "format_version": FORMAT_VERSION,
        "family": index.family,
        "metric": corpus.metric.value,
        "n": corpus.n,
        "dim": corpus.dim,
        "params": _jsonable(state.get("params", {})),
        "has_ids": corpus.ids is not None,
    }
    arrays: dict[str, np.ndarray] = {
        "__vectors__": np.asarray(corpus.vectors[: corpus.n, : corpus.dim]),
    }
    if corpus.ids is not None:
        arrays["__ids__"] = np.asarray([str(i) for i in corpus.ids])
    for name, arr in state.get("arrays", {}).items():
        arrays[f"arr_{name}"] = np.asarray(arr)
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez_compressed(path, __header__=json.dumps(header), **arrays)
    return path


def load_index(path: str):
    """Load a saved index of any family; the metric and params come from the
    stored header (no re-supplied distance fn, unlike index_io.clj:41-43)."""
    from hnsw_tpu.models import INDEX_CLASSES
    from hnsw_tpu.types import Corpus

    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(str(z["__header__"]))
        if header["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"index format {header['format_version']} is newer than "
                f"supported {FORMAT_VERSION}")
        vectors = z["__vectors__"]
        ids = [str(s) for s in z["__ids__"]] if header.get("has_ids") else None
        arrays = {k[4:]: z[k] for k in z.files if k.startswith("arr_")}

    corpus = Corpus.from_array(vectors, metric=header["metric"], ids=ids)
    cls = INDEX_CLASSES[header["family"]]
    state = {"params": header.get("params", {}), "arrays": arrays}
    return cls.from_state(corpus, state)


def index_exists(path: str) -> bool:
    """index-exists? (index_io.clj:82-85)."""
    return os.path.exists(path) or os.path.exists(path + ".npz")


def _jsonable(d: dict) -> dict:
    out = {}
    for k, v in d.items():
        if isinstance(v, (np.integer,)):
            v = int(v)
        elif isinstance(v, (np.floating,)):
            v = float(v)
        out[k] = v
    return out
