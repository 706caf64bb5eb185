"""Index persistence: versioned whole-index snapshots.

The reference serializes its graph to EDN text (helper/index_io.clj:10-39
save, :41-80 load; ~493 MB for 31k vectors) and does NOT serialize the
distance function — the caller must re-supply it (index_io.clj:41-43), which
its own integration tests get wrong (SURVEY.md §2.9). Here every index is a
set of dense arrays, so persistence is one compressed .npz with a versioned
JSON header that DOES record the metric, the family and all build params —
load needs nothing but the path. Per-id metadata rides along too (the
reference's EDN save drops it, simple.clj:62-74 + index_io.clj:10-39).

For indexes that exceed host RAM there is a second on-disk layout,
``format="dir"``: a directory of raw .npy files loaded with numpy memory
mapping and staged to the device in bounded row chunks — the completed form
of the reference's memory-mapped index prototype
(wip/ultra_optimized.clj:196-242, save-only/incomplete there).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import numpy as np

FORMAT_VERSION = 2

# rows per host->device copy when staging a memory-mapped corpus: bounds
# transient host memory to chunk_rows * d_pad * 4 bytes
STREAM_CHUNK_ROWS = 65536


def save_index(index, path: str, *, metadata: Optional[dict] = None,
               format: str = "npz") -> str:
    """Snapshot an index (PersistableIndex analogue, protocol.clj:43-56).

    metadata: optional JSON-serializable per-id map stored with the index
    (Index.save passes its metadata table so load is self-contained).
    format: "npz" (one compressed file) or "dir" (raw .npy directory that
    loads memory-mapped — use for indexes near or beyond host RAM)."""
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
        "has_metadata": bool(metadata),
    }
    arrays: dict[str, np.ndarray] = {
        "__vectors__": np.asarray(corpus.vectors[: corpus.n, : corpus.dim]),
    }
    if corpus.ids is not None:
        arrays["__ids__"] = np.asarray([str(i) for i in corpus.ids])
    for name, arr in state.get("arrays", {}).items():
        arrays[f"arr_{name}"] = np.asarray(arr)

    if format == "dir":
        d = path if path.endswith(".idx") else path + ".idx"
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "header.json"), "w") as f:
            json.dump(header, f)
        if metadata:
            with open(os.path.join(d, "metadata.json"), "w") as f:
                json.dump(metadata, f)
        for name, arr in arrays.items():
            np.save(os.path.join(d, name.strip("_") + ".npy"),
                    arr, allow_pickle=False)
        return d
    if format != "npz":
        raise ValueError(f"unknown index format {format!r}")
    if metadata:
        arrays["__metadata__"] = np.asarray(json.dumps(metadata))
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez_compressed(path, __header__=json.dumps(header), **arrays)
    return path


def load_index(path: str, *, return_metadata: bool = False,
               mmap: bool = True, stream_chunk_rows: int = STREAM_CHUNK_ROWS):
    """Load a saved index of any family; the metric and params come from the
    stored header (no re-supplied distance fn, unlike index_io.clj:41-43).

    Accepts both layouts (.npz file or .idx directory). Directory loads map
    arrays with numpy mmap (mmap=True) and stage the corpus to device in
    `stream_chunk_rows` chunks, so host RAM never holds the full matrix.
    With return_metadata=True returns (index, metadata_dict)."""
    d = _resolve_dir(path)
    if d is not None:
        return _load_dir(d, return_metadata=return_metadata, mmap=mmap,
                         stream_chunk_rows=stream_chunk_rows)

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
        meta = json.loads(str(z["__metadata__"])) \
            if "__metadata__" in z.files else {}

    corpus = Corpus.from_array(vectors, metric=header["metric"], ids=ids)
    cls = INDEX_CLASSES[header["family"]]
    state = {"params": header.get("params", {}), "arrays": arrays}
    idx = cls.from_state(corpus, state)
    return (idx, meta) if return_metadata else idx


def _resolve_dir(path: str) -> Optional[str]:
    for cand in (path, path + ".idx"):
        if os.path.isdir(cand) and \
                os.path.exists(os.path.join(cand, "header.json")):
            return cand
    return None


def _load_dir(d: str, *, return_metadata: bool, mmap: bool,
              stream_chunk_rows: int):
    from hnsw_tpu.models import INDEX_CLASSES
    from hnsw_tpu.types import Corpus

    with open(os.path.join(d, "header.json")) as f:
        header = json.load(f)
    if header["format_version"] > FORMAT_VERSION:
        raise ValueError(
            f"index format {header['format_version']} is newer than "
            f"supported {FORMAT_VERSION}")
    mode = "r" if mmap else None

    def arr(name):
        return np.load(os.path.join(d, name + ".npy"), mmap_mode=mode,
                       allow_pickle=False)

    vectors = arr("vectors")
    ids = [str(s) for s in np.load(os.path.join(d, "ids.npy"),
                                   allow_pickle=False)] \
        if header.get("has_ids") else None
    arrays = {}
    for fn in os.listdir(d):
        if fn.startswith("arr_") and fn.endswith(".npy"):
            arrays[fn[4:-4]] = arr(fn[:-4])
    meta = {}
    mp = os.path.join(d, "metadata.json")
    if os.path.exists(mp):
        with open(mp) as f:
            meta = json.load(f)

    corpus = Corpus.from_array_streamed(
        vectors, metric=header["metric"], ids=ids,
        chunk_rows=stream_chunk_rows)
    cls = INDEX_CLASSES[header["family"]]
    idx = cls.from_state(corpus, {"params": header.get("params", {}),
                                  "arrays": arrays})
    return (idx, meta) if return_metadata else idx


def index_exists(path: str) -> bool:
    """index-exists? (index_io.clj:82-85)."""
    return (os.path.exists(path) or os.path.exists(path + ".npz")
            or _resolve_dir(path) is not None)


def _jsonable(d: dict) -> dict:
    out = {}
    for k, v in d.items():
        if isinstance(v, (np.integer,)):
            v = int(v)
        elif isinstance(v, (np.floating,)):
            v = float(v)
        out[k] = v
    return out
