"""Simple stateful API — the reference's convenience layer.

api/simple.clj wraps a mutable index in an atom: (index {:dimensions 768})
then add! with optional per-id metadata, search returning metadata-joined
hits, save/load-index, info (simple.clj:8-82). Here the same surface is a
class; adds are buffered and flushed as batched wave inserts before the next
search (each reference add! is one sequential graph insert; batching them is
the TPU-correct equivalent and strictly faster).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from hnsw_tpu.config import Mode
from hnsw_tpu.io.persist import load_index as _load, save_index as _save
from hnsw_tpu.models import FAMILIES
from hnsw_tpu.models.hnsw import HNSWIndex


class Index:
    """Stateful index with string ids and per-id metadata."""

    def __init__(self, dimensions: Optional[int] = None,
                 distance: str = "cosine", index_type: str = "hnsw", **opts):
        self.dimensions = dimensions
        self.distance = str(distance).lstrip(":").lower()
        self.index_kind = str(index_type).lstrip(":").lower().replace("-", "_")
        self.opts = opts
        self.metadata: Dict[str, Any] = {}
        self._pending: List[tuple] = []      # (id, vector)
        self._impl = None

    # ---- mutation ------------------------------------------------------

    def add(self, item_id, vector, metadata: Optional[dict] = None) -> str:
        """add! (simple.clj:31-49). Returns the normalized string id."""
        vector = np.asarray(vector, np.float32)
        if self.dimensions is None:
            self.dimensions = int(vector.shape[-1])
        elif vector.shape[-1] != self.dimensions:
            raise ValueError(
                f"vector dim {vector.shape[-1]} != index dim {self.dimensions}")
        sid = str(item_id)
        self._pending.append((sid, vector))
        if metadata is not None:
            self.metadata[sid] = metadata
        return sid

    add_ = add  # spelling alias for the reference's add!

    def add_batch(self, items) -> List[str]:
        """items: iterable of (id, vector) or (id, vector, metadata)."""
        out = []
        for it in items:
            out.append(self.add(*it))
        return out

    def _flush(self):
        if not self._pending:
            return
        ids = [p[0] for p in self._pending]
        vecs = np.stack([p[1] for p in self._pending])
        self._pending.clear()
        if self._impl is None:
            self._impl = FAMILIES[self.index_kind](
                vecs, metric=self.distance, ids=ids, **self.opts)
        elif isinstance(self._impl, HNSWIndex):
            self._impl.add_batch(vecs, ids=ids)
        else:
            # non-graph families rebuild (their builds are cheap GEMMs)
            old_n = self._impl.corpus.n
            old = np.asarray(
                self._impl.corpus.vectors[:old_n, : self._impl.corpus.dim])
            old_ids = list(self._impl.corpus.ids) if \
                self._impl.corpus.ids is not None else \
                [str(i) for i in range(old_n)]
            self._impl = FAMILIES[self.index_kind](
                np.concatenate([old, vecs]), metric=self.distance,
                ids=old_ids + ids, **self.opts)

    # ---- queries -------------------------------------------------------

    def search(self, vector, k: int = 10, mode: Mode = Mode.BALANCED
               ) -> List[dict]:
        """Metadata-joined hits (simple.clj:51-60)."""
        self._flush()
        if self._impl is None:
            return []
        hits = self._impl.search(vector, k, mode)
        for h in hits:
            md = self.metadata.get(h["id"])
            if md is not None:
                h["metadata"] = md
        return hits

    def info(self) -> Dict[str, Any]:
        self._flush()
        base = {"dimensions": self.dimensions, "distance_type": self.distance,
                "index_type": self.index_kind,
                "size": self._impl.corpus.n if self._impl else 0}
        if self._impl is not None:
            base.update(self._impl.index_info())
        return base

    @property
    def size(self) -> int:
        self._flush()
        return self._impl.corpus.n if self._impl else 0

    # ---- persistence (simple.clj:62-74) --------------------------------

    def save(self, path: str, *, format: str = "npz") -> str:
        """Persist the index INCLUDING the per-id metadata table (the
        reference's EDN save drops metadata — index_io.clj:10-39 — forcing
        callers to re-supply it on load, the trap its own integration tests
        fell into). format="dir" writes the mmap-loadable layout."""
        self._flush()
        if self._impl is None:
            raise ValueError("cannot save an empty index")
        return _save(self._impl, path, metadata=self.metadata or None,
                     format=format)

    @classmethod
    def load(cls, path: str, metadata: Optional[Dict[str, Any]] = None
             ) -> "Index":
        """Load a saved index; metadata stored in the artifact is restored
        automatically (a `metadata` argument overrides stored entries)."""
        impl, saved_meta = _load(path, return_metadata=True)
        out = cls(dimensions=impl.corpus.dim,
                  distance=impl.corpus.metric.value,
                  index_type=impl.family)
        out._impl = impl
        out.metadata = {**saved_meta, **(metadata or {})}
        return out
