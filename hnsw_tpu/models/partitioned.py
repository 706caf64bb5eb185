"""Partitioned HNSW: N independent sub-indexes searched in parallel.

Reference: src/hnsw/ann/partition/partitioned_hnsw.clj — shuffle the data
(critical for ordered corpora, :75-86), split into N=8 equal chunks, build
one HNSW per partition (:100-119), fan the query out to every partition with
an adaptive per-partition k (<=8 partitions -> 3, <=32 -> 2, else 1;
:158-162) and merge+sort the union (:182-196). Its three thread-pool search
modes (:lightning/:ultra/:turbo, :198-256) all reduce to the same batched
computation here.

TPU design: the P sub-graphs are stacked arrays — vectors [P, S, D],
adjacency [P, S, M0], entries [P] — and search is a single vmap of the
batched beam search over the partition axis, followed by an exact top-k merge
(shards are disjoint, so no dedupe is needed). The same stacked layout shards
across chips over a mesh axis with shard_map, with the merge becoming an ICI
all-gather + local top-k (see hnsw_tpu.parallel.sharded).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hnsw_tpu.config import DEFAULTS, Mode, adaptive_k_per_partition, ef_for
from hnsw_tpu.models.base import ANNIndex
from hnsw_tpu.models.common import as_corpus
from hnsw_tpu.models.hnsw import build_graph
from hnsw_tpu.models.hnsw.search import hnsw_search_batch
from hnsw_tpu.ops.topk import top_k_ascending
from hnsw_tpu.types import Corpus, Metric, round_up


class PartitionedHNSWIndex(ANNIndex):
    family = "partitioned_hnsw"

    qps_scan_safe = False  # hop-loop program: see bench/harness.py

    def __init__(self, corpus: Corpus, *, num_partitions: int,
                 vectors_p, v_sq_p, rows_p, adj0_p, adj_upper_p, entries_p,
                 m: int, m0: int, ef_construction: int, seed: int = 42):
        super().__init__(corpus)
        self.num_partitions = num_partitions
        self.vectors_p = vectors_p       # [P, S, D]
        self.v_sq_p = v_sq_p             # [P, S]
        self.rows_p = rows_p             # [P, S] global original rows (-1 pad)
        self.adj0_p = adj0_p             # [P, S, M0]
        self.adj_upper_p = adj_upper_p   # [P, L, S, M]
        self.entries_p = entries_p       # [P]
        self.m, self.m0 = m, m0
        self.ef_construction = ef_construction
        self.seed = seed
        self._adj_g = None
        self._ent_g = None
        self._vec_lp = None
        self._nbr_pack = None
        self._nbr_sq = None

    # same budget rule as HNSWIndex for the packed-neighborhood table
    PACK_BYTES_CAP = 6 << 30

    def _globalized(self):
        """The P disjoint sub-graphs merged into ONE corpus-indexed adjacency
        (edges never cross partitions) + per-partition global entry rows —
        the layout that lets partitioned search share the packed-neighbor
        ring-DMA fast path with HNSW/IVF-HNSW instead of vmapping P
        full-precision row-gather hop loops (measured 199 -> ~4k QPS)."""
        if self._adj_g is None:
            rows = np.asarray(self.rows_p)            # [P, S] global rows
            adj0 = np.asarray(self.adj0_p)            # [P, S, M0] local ids
            g = np.full((self.corpus.n_pad, adj0.shape[-1]), -1, np.int32)
            for p in range(rows.shape[0]):
                ok = rows[p] >= 0
                loc = adj0[p][ok]
                g[rows[p][ok]] = np.where(
                    loc >= 0, rows[p][np.maximum(loc, 0)], -1)
            ent = rows[np.arange(rows.shape[0]), np.asarray(self.entries_p)]
            self._adj_g = jnp.asarray(g)
            self._ent_g = jnp.asarray(ent.astype(np.int32))
        return self._adj_g, self._ent_g

    def search_batch(self, queries, k: int, mode: Mode = Mode.BALANCED,
                     ef: Optional[int] = None,
                     k_per_partition: Optional[int] = None):
        q = self.corpus.pad_queries(queries)
        b = q.shape[0]
        mode = Mode.coerce(mode)
        if k_per_partition is None:
            # :precise merges full k from every shard; other modes use the
            # reference's adaptive per-partition k (partitioned_hnsw.clj:158-162)
            k_per_partition = k if mode == Mode.PRECISE else \
                min(k, adaptive_k_per_partition(self.num_partitions, k))
        ef = ef if ef is not None else ef_for(mode, k_per_partition)

        adj_g, ent_g = self._globalized()
        p_cnt = self.num_partitions
        vq = jnp.repeat(q, p_cnt, axis=0)              # [B*P, D] q-major
        ve = jnp.tile(ent_g, b)                        # [B*P]
        precision = ("default" if self.corpus.metric == Metric.COSINE
                     else "highest")
        if self._vec_lp is None or \
                self._vec_lp.shape != self.corpus.vectors.shape:
            self._vec_lp = self.corpus.vectors.astype(jnp.bfloat16)
        m0 = adj_g.shape[1]
        dim = self.corpus.vectors.shape[1]
        use_pack = precision != "highest" and (
            adj_g.shape[0] * m0 * (dim * 2 + 4) <= self.PACK_BYTES_CAP)
        if use_pack and self._nbr_pack is None:
            from hnsw_tpu.models.hnsw.search import pack_neighbors
            self._nbr_pack, self._nbr_sq = pack_neighbors(
                self._vec_lp, self.corpus.sq_norms, adj_g)
        hop_kernel = "pallas" if (
            jax.default_backend() == "tpu" and use_pack
            and dim % 128 == 0 and (4 * m0) % 128 == 0) else None
        no_upper = jnp.zeros((0, adj_g.shape[0], self.m), jnp.int32)
        d_v, g_v = hnsw_search_batch(
            self.corpus.vectors, self.corpus.sq_norms,
            adj_g, no_upper, ve, vq,
            k=k_per_partition, ef=ef, metric=self.corpus.metric,
            precision=precision, vectors_lp=self._vec_lp,
            nbr_pack=self._nbr_pack if use_pack else None,
            nbr_sq=self._nbr_sq if use_pack else None,
            hop_kernel=hop_kernel)                     # [B*P, kpp]
        # merge: [B*P, kpp] -> [B, P*kpp] -> top-k (shards disjoint: no dedupe)
        d_all = d_v.reshape(b, -1)
        g_all = g_v.reshape(b, -1)
        dk, sel = top_k_ascending(d_all, min(k, d_all.shape[-1]))
        rk = jnp.take_along_axis(g_all, sel, axis=-1)
        rk = jnp.where(dk < 1e29, rk, -1)
        if dk.shape[-1] < k:
            pad = k - dk.shape[-1]
            dk = jnp.pad(dk, ((0, 0), (0, pad)), constant_values=1e30)
            rk = jnp.pad(rk, ((0, 0), (0, pad)), constant_values=-1)
        return dk, rk

    def index_info(self) -> Dict[str, Any]:
        sizes = np.asarray((self.rows_p >= 0).sum(axis=1))
        return {
            "type": self.family,
            "num_vectors": self.corpus.n,
            "dimensions": self.corpus.dim,
            "metric": self.corpus.metric.value,
            "num_partitions": self.num_partitions,
            "partition_sizes": sizes.tolist(),
            "M": self.m, "M0": self.m0,
            "ef_construction": self.ef_construction,
        }

    def to_state(self) -> Dict[str, Any]:
        return {
            "params": {
                "num_partitions": self.num_partitions, "M": self.m,
                "M0": self.m0, "ef_construction": self.ef_construction,
                "seed": self.seed,
            },
            "arrays": {
                "rows_p": np.asarray(self.rows_p),
                "adj0_p": np.asarray(self.adj0_p),
                "adj_upper_p": np.asarray(self.adj_upper_p),
                "entries_p": np.asarray(self.entries_p),
            },
        }

    @classmethod
    def from_state(cls, corpus: Corpus,
                   state: Dict[str, Any]) -> "PartitionedHNSWIndex":
        p, a = state["params"], state["arrays"]
        rows_p = np.asarray(a["rows_p"])
        host = np.asarray(corpus.vectors)
        sq = np.asarray(corpus.sq_norms)
        pp, s = rows_p.shape
        vecs = np.zeros((pp, s, corpus.d_pad), np.float32)
        vsq = np.zeros((pp, s), np.float32)
        ok = rows_p >= 0
        vecs[ok] = host[rows_p[ok]]
        vsq[ok] = sq[rows_p[ok]]
        return cls(
            corpus, num_partitions=int(p["num_partitions"]),
            vectors_p=jnp.asarray(vecs), v_sq_p=jnp.asarray(vsq),
            rows_p=jnp.asarray(rows_p), adj0_p=jnp.asarray(a["adj0_p"]),
            adj_upper_p=jnp.asarray(a["adj_upper_p"]),
            entries_p=jnp.asarray(a["entries_p"]),
            m=int(p["M"]), m0=int(p["M0"]),
            ef_construction=int(p["ef_construction"]),
            seed=int(p.get("seed", 42)))


def build_partitioned_hnsw(
    data,
    *,
    num_partitions: int = 8,   # reference default (partitioned_hnsw.clj)
    M: int = DEFAULTS["M"],
    max_M0: Optional[int] = None,
    ef_construction: int = 50,  # reference passes 50 (partitioned_hnsw.clj:109)
    metric="cosine",
    ids=None,
    seed: int = DEFAULTS["seed"],
    shuffle: bool = True,
    **_ignored,
) -> PartitionedHNSWIndex:
    corpus = as_corpus(data, metric=metric, ids=ids)
    n = corpus.n
    p = max(1, min(num_partitions, max(n, 1)))
    m0 = max_M0 or 2 * M

    rng = np.random.default_rng(seed)
    order = rng.permutation(n) if shuffle else np.arange(n)
    shard_size = round_up(max((n + p - 1) // p, 1), 8)

    host = np.asarray(corpus.vectors)
    rows_p = np.full((p, shard_size), -1, np.int32)
    graphs = []
    max_l = 0
    for i in range(p):
        rows = order[i * ((n + p - 1) // p):(i + 1) * ((n + p - 1) // p)]
        rows_p[i, : len(rows)] = rows
        shard_data = host[rows][:, : corpus.dim] if len(rows) else \
            np.zeros((0, corpus.dim), np.float32)
        sub = Corpus.from_array(shard_data, metric=corpus.metric,
                                pad_rows_to=shard_size)
        g = build_graph(sub, m=M, m0=m0, ef_construction=ef_construction,
                        seed=seed + i)
        graphs.append((sub, g))
        max_l = max(max_l, g.adj_upper.shape[0])

    vecs = np.zeros((p, shard_size, corpus.d_pad), np.float32)
    vsq = np.zeros((p, shard_size), np.float32)
    adj0 = np.full((p, shard_size, m0), -1, np.int32)
    adju = np.full((p, max_l, shard_size, M), -1, np.int32)
    entries = np.zeros(p, np.int32)
    for i, (sub, g) in enumerate(graphs):
        vecs[i, : sub.n_pad] = np.asarray(sub.vectors)
        vsq[i, : sub.n_pad] = np.asarray(sub.sq_norms)
        adj0[i, : sub.n_pad] = np.asarray(g.adj0)
        lu = g.adj_upper.shape[0]
        if lu:
            adju[i, :lu, : sub.n_pad] = np.asarray(g.adj_upper)
        # keep -1 for empty partitions: hnsw_search_batch masks cur<0 to BIG
        # and returns -1; clamping to 0 would seed the beam on a padding row
        # whose fake id=-1 result can displace real neighbors at the merge
        entries[i] = g.entry

    return PartitionedHNSWIndex(
        corpus, num_partitions=p,
        vectors_p=jnp.asarray(vecs), v_sq_p=jnp.asarray(vsq),
        rows_p=jnp.asarray(rows_p), adj0_p=jnp.asarray(adj0),
        adj_upper_p=jnp.asarray(adju), entries_p=jnp.asarray(entries),
        m=M, m0=m0, ef_construction=ef_construction, seed=seed)
