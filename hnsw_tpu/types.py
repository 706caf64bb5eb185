"""Core data types: metrics, the packed corpus substrate, search results.

The reference keeps vectors as per-node ``double[]`` inside string-keyed
ConcurrentHashMaps (reference: src/hnsw/ultra_fast.clj:99-111) — the single
most TPU-hostile layout choice it made. Here every index family shares one
HBM-resident packed matrix ``float32[N_pad, D_pad]`` plus precomputed squared
norms (the reference precomputes norms too: src/hnsw/ann/partition/
ivf_flat.clj:161-179), with int32 row ids internally and a string-id table at
the API edge.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class Metric(str, enum.Enum):
    """Distance metrics. The reference supports cosine / euclidean / dot
    (src/hnsw/simd_optimized.clj:145-160); distance is ascending-better:
    cosine -> 1 - cos_sim, euclidean -> L2, dot -> -dot."""

    COSINE = "cosine"
    EUCLIDEAN = "euclidean"
    DOT = "dot"

    @classmethod
    def coerce(cls, m: "Metric | str") -> "Metric":
        if isinstance(m, Metric):
            return m
        key = str(m).lstrip(":").lower()
        aliases = {"l2": "euclidean", "angular": "cosine", "ip": "dot",
                   "inner-product": "dot", "inner_product": "dot"}
        return cls(aliases.get(key, key))


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Lane width of the TPU VPU/MXU: last-dim tiles are always 128 wide.
LANE = 128
# Sublane granularity for float32.
SUBLANE = 8


@dataclasses.dataclass
class Corpus:
    """Packed, padded corpus: the substrate every index family builds on.

    Attributes:
      vectors:  float32[N_pad, D_pad] — rows >= n are zero padding.
      sq_norms: float32[N_pad] — squared L2 norms (0 for padding).
      n:        number of real rows.
      dim:      real dimensionality (D_pad >= dim, zero-padded columns).
      metric:   default metric for indexes built on this corpus.
      ids:      optional external string ids, host-side (length n).
    """

    vectors: jnp.ndarray
    sq_norms: jnp.ndarray
    n: int
    dim: int
    metric: Metric = Metric.COSINE
    ids: Optional[np.ndarray] = None

    @property
    def n_pad(self) -> int:
        return int(self.vectors.shape[0])

    @property
    def d_pad(self) -> int:
        return int(self.vectors.shape[1])

    @classmethod
    def from_array(
        cls,
        data: np.ndarray,
        *,
        metric: "Metric | str" = Metric.COSINE,
        ids: Optional[Sequence[Any]] = None,
        pad_rows_to: int = SUBLANE,
    ) -> "Corpus":
        """Pack a host array [n, dim] into the padded device layout."""
        data = np.asarray(data, dtype=np.float32)
        if data.ndim != 2:
            raise ValueError(f"expected [n, dim] array, got shape {data.shape}")
        n, dim = data.shape
        n_pad = round_up(max(n, 1), pad_rows_to)
        d_pad = round_up(dim, LANE)
        packed = np.zeros((n_pad, d_pad), dtype=np.float32)
        packed[:n, :dim] = data
        vectors = jnp.asarray(packed)
        sq_norms = jnp.sum(vectors * vectors, axis=-1)
        id_table = None
        if ids is not None:
            if len(ids) != n:
                raise ValueError(f"{len(ids)} ids for {n} vectors")
            id_table = np.asarray([str(i) for i in ids], dtype=object)
        return cls(vectors=vectors, sq_norms=sq_norms, n=n, dim=dim,
                   metric=Metric.coerce(metric), ids=id_table)

    @classmethod
    def from_array_streamed(
        cls,
        data,
        *,
        metric: "Metric | str" = Metric.COSINE,
        ids: Optional[Sequence[Any]] = None,
        pad_rows_to: int = SUBLANE,
        chunk_rows: int = 65536,
    ) -> "Corpus":
        """Pack a host array into the device layout WITHOUT materializing a
        full host copy: rows are padded and device_put in `chunk_rows`
        chunks, then concatenated on device. Use for numpy memmaps of
        indexes near or beyond host RAM (io/persist.py dir format — the
        completed form of the reference's mmap prototype,
        wip/ultra_optimized.clj:196-242). Transient host memory is one
        chunk; device peak is ~2x the corpus during the final concat."""
        import jax

        if getattr(data, "ndim", 2) != 2:
            raise ValueError(f"expected [n, dim] array, got {data.shape}")
        n, dim = data.shape
        if n <= chunk_rows:
            return cls.from_array(np.asarray(data, np.float32), metric=metric,
                                  ids=ids, pad_rows_to=pad_rows_to)
        n_pad = round_up(n, pad_rows_to)
        d_pad = round_up(dim, LANE)
        parts = []
        for s in range(0, n_pad, chunk_rows):
            rows = min(chunk_rows, n_pad - s)
            block = np.zeros((rows, d_pad), np.float32)
            real = max(min(n - s, rows), 0)
            if real:
                block[:real, :dim] = data[s: s + real]
            parts.append(jax.device_put(block))
        vectors = jnp.concatenate(parts, axis=0)
        sq_norms = jnp.sum(vectors * vectors, axis=-1)
        id_table = None
        if ids is not None:
            if len(ids) != n:
                raise ValueError(f"{len(ids)} ids for {n} vectors")
            id_table = np.asarray([str(i) for i in ids], dtype=object)
        return cls(vectors=vectors, sq_norms=sq_norms, n=n, dim=dim,
                   metric=Metric.coerce(metric), ids=id_table)

    @classmethod
    def from_pairs(cls, pairs: Sequence[tuple], **kw) -> "Corpus":
        """Build from the reference's native data shape: a sequence of
        ``[id, vector]`` pairs (reference: src/hnsw/ultra_fast.clj:334-344,
        data arg is ``[[id double-array] ...]``)."""
        ids = [p[0] for p in pairs]
        data = np.asarray([np.asarray(p[1], dtype=np.float32) for p in pairs])
        return cls.from_array(data, ids=ids, **kw)

    def row_ids_to_external(self, rows: np.ndarray) -> np.ndarray:
        """Map internal int rows to external string ids (identity if none)."""
        rows = np.asarray(rows)
        if self.ids is None:
            return rows
        flat = rows.reshape(-1)
        out = np.empty(flat.shape, dtype=object)
        valid = (flat >= 0) & (flat < self.n)
        out[valid] = self.ids[flat[valid].astype(np.int64)]
        out[~valid] = None
        return out.reshape(rows.shape)

    def pad_queries(self, queries) -> jnp.ndarray:
        """Pad queries [..., dim] to [..., d_pad] float32. Device arrays of
        the right shape pass through untouched (no host roundtrip)."""
        if isinstance(queries, jnp.ndarray) and not isinstance(queries, np.ndarray):
            if queries.ndim == 2 and queries.shape[-1] == self.d_pad:
                return queries.astype(jnp.float32)
            if queries.ndim == 2 and queries.shape[-1] == self.dim:
                return jnp.pad(queries.astype(jnp.float32),
                               ((0, 0), (0, self.d_pad - self.dim)))
        q = np.asarray(queries, dtype=np.float32)
        squeeze = q.ndim == 1
        if squeeze:
            q = q[None, :]
        if q.shape[-1] != self.dim:
            raise ValueError(f"query dim {q.shape[-1]} != corpus dim {self.dim}")
        if q.shape[-1] != self.d_pad:
            padw = [(0, 0)] * (q.ndim - 1) + [(0, self.d_pad - q.shape[-1])]
            q = np.pad(q, padw)
        return jnp.asarray(q)


@dataclasses.dataclass
class SearchResult:
    """One query's k results, ascending by distance — mirrors the reference's
    ``[{:id .. :distance ..} ...]`` return shape (src/hnsw/ann/partition/
    ivf_flat.clj:291-294)."""

    ids: np.ndarray        # external ids (or int rows) [k]
    distances: np.ndarray  # float32 [k]
    rows: np.ndarray       # internal int rows [k] (-1 = no result)

    def to_dicts(self):
        out = []
        for i in range(len(self.rows)):
            if int(self.rows[i]) < 0:
                continue
            out.append({"id": self.ids[i], "distance": float(self.distances[i])})
        return out

    def __len__(self):
        return int(np.sum(np.asarray(self.rows) >= 0))
