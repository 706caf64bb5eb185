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

from hnsw_tpu.config import DEFAULTS, Mode, ef_for
from hnsw_tpu.models.base import ANNIndex
from hnsw_tpu.models.common import as_corpus
from hnsw_tpu.models.hnsw.search import hnsw_search_batch
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
        # wider per-hop expansion than plain HNSW: the shared beam carries P
        # interleaved partition frontiers, and e=8 halves the hop count at
        # the same total candidate work (C = e*M0 = 256 stays lane-aligned)
        self.expand = 8
        self._adj_g = None
        self._ent_g = None
        self._entry_samples = None
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

    ENTRY_SAMPLE_PER_PARTITION = 256
    SEEDS_PER_PARTITION = 4

    def _partition_seed_rows(self) -> jnp.ndarray:
        """[P, S] evenly-spaced global row sample per partition for
        sample_entries_grouped (-1 padded). Shuffled partitions span every
        topic cluster, so a modest evenly-spaced sample covers them."""
        if self._entry_samples is None:
            rows = np.asarray(self.rows_p)
            s = self.ENTRY_SAMPLE_PER_PARTITION
            samp = np.full((rows.shape[0], s), -1, np.int32)
            for p in range(rows.shape[0]):
                ok = rows[p][rows[p] >= 0]
                if len(ok):
                    sel = np.unique(np.linspace(0, len(ok) - 1,
                                                min(s, len(ok))).astype(int))
                    samp[p, : len(sel)] = ok[sel]
            self._entry_samples = jnp.asarray(samp)
        return self._entry_samples

    def search_batch(self, queries, k: int, mode: Mode = Mode.BALANCED,
                     ef: Optional[int] = None,
                     k_per_partition: Optional[int] = None):
        """One SHARED beam per query seeded at every partition's entry row
        (hnsw_search_batch multi-entry path over the globalized adjacency):
        the P disjoint shard graphs compete inside a single ef-wide beam —
        the TPU form of the reference's fan-out-to-every-partition-and-merge
        (partitioned_hnsw.clj:158-196), without P independent ef budgets
        per query (round 3 measured 978 QPS at B*P virtual queries with
        ef=500; the shared beam is one HNSW-cost search). k_per_partition
        survives as a recall knob: when given (or in :precise mode, which
        the reference defines as full k from every shard), ef is widened to
        at least P * kpp so every shard can hold that many candidates in
        the shared beam."""
        q = self.corpus.pad_queries(queries)
        b = q.shape[0]
        mode = Mode.coerce(mode)
        if k_per_partition is None and mode == Mode.PRECISE:
            k_per_partition = k
        if ef is None:
            # partitioned-specific accurate point: the shared beam's
            # recall ladder measured ef=300 -> 0.953, 420 -> 0.983,
            # 500 -> 0.992 at 31k/8 shards (scripts/_probe_r5c.py), so the
            # generic accurate preset (300) sits under the family's
            # documented 90-95% band's top while 420 clears 0.98 at 11.5k
            # QPS — a true mid-rung between balanced and precise
            ef = 420 if mode == Mode.ACCURATE else ef_for(mode, k)
        if k_per_partition is not None:
            ef = max(ef, self.num_partitions * k_per_partition)

        adj_g, _ = self._globalized()
        from hnsw_tpu.models.hnsw.search import (prepare_hop_fast_path,
                                                 sample_entries_grouped)
        entries = sample_entries_grouped(
            self.corpus.vectors, self.corpus.sq_norms,
            self._partition_seed_rows(), q, metric=self.corpus.metric,
            r=self.SEEDS_PER_PARTITION)
        kw = prepare_hop_fast_path(self, self.corpus, adj_g,
                                   expand=self.expand, ef=ef,
                                   pack_bytes_cap=self.PACK_BYTES_CAP)
        no_upper = jnp.zeros((0, adj_g.shape[0], self.m), jnp.int32)
        return hnsw_search_batch(
            self.corpus.vectors, self.corpus.sq_norms,
            adj_g, no_upper, entries, q,
            k=k, ef=ef, metric=self.corpus.metric, rerank=4 * k, **kw)

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
        # device row-gather, not a host-side corpus fetch (the corpus may
        # live across a slow device link; see build_partitioned_hnsw)
        vecs, vsq = _stack_shards(corpus.vectors, corpus.sq_norms,
                                  jnp.asarray(rows_p))
        return cls(
            corpus, num_partitions=int(p["num_partitions"]),
            vectors_p=vecs, v_sq_p=vsq,
            rows_p=jnp.asarray(rows_p), adj0_p=jnp.asarray(a["adj0_p"]),
            adj_upper_p=jnp.asarray(a["adj_upper_p"]),
            entries_p=jnp.asarray(a["entries_p"]),
            m=int(p["M"]), m0=int(p["M0"]),
            ef_construction=int(p["ef_construction"]),
            seed=int(p.get("seed", 42)))


@jax.jit
def _stack_shards(vectors, v_sq, rows_p):
    """[P, S] global rows -> ([P, S, D], [P, S]) stacked shard arrays, all
    on device (pad rows -1 -> zero vectors)."""
    ok = rows_p >= 0
    r = jnp.maximum(rows_p, 0)
    vecs = jnp.where(ok[:, :, None], jnp.take(vectors, r, axis=0), 0.0)
    vsq = jnp.where(ok, jnp.take(v_sq, r, axis=0), 0.0)
    return vecs, vsq


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
    progress=None,             # callable(stage: str, fraction: float) — the
                               # same tick protocol as build_graph; stages:
                               # "stack_l{l}" (stacked level dispatch+fetch),
                               # "bridge_l{l}" (per-partition connectivity
                               # repair), "gather" (shard vector pack)
    **_ignored,
) -> PartitionedHNSWIndex:
    def _tick(stage, frac):
        if progress is not None:
            progress(stage, frac)
    corpus = as_corpus(data, metric=metric, ids=ids)
    n = corpus.n
    p = max(1, min(num_partitions, max(n, 1)))
    m0 = max_M0 or 2 * M

    rng = np.random.default_rng(seed)
    order = rng.permutation(n) if shuffle else np.arange(n)
    shard_size = round_up(max((n + p - 1) // p, 1), 8)

    # All P shard graphs build LEVEL-BY-LEVEL as stacked dispatches
    # (build_layers_stacked: one vmapped device program builds the same
    # level of EVERY partition) instead of P sequential build_graph calls —
    # the per-partition loop paid P x (dispatch + fetch + repair) and took
    # ~40 s at 31k/8 on the relay (the reference's 8-thread build is 6-7 s,
    # partitioned_hnsw.clj:100-119); stacked it is a handful of dispatches.
    import math as _math

    from hnsw_tpu.models.hnsw.build import build_layers_stacked
    from hnsw_tpu.models.hnsw.graph import assign_levels
    from hnsw_tpu.models.hnsw.repair import bridge_components

    rows_p = np.full((p, shard_size), -1, np.int32)
    counts = []
    for i in range(p):
        rows = order[i * ((n + p - 1) // p):(i + 1) * ((n + p - 1) // p)]
        rows_p[i, : len(rows)] = rows
        counts.append(len(rows))
    ml = 1.0 / _math.log(2.0)
    levels = [assign_levels(c, ml, seed + i,
                            max_cap=max(int(_math.log2(max(c, 2))), 1))
              for i, c in enumerate(counts)]
    max_l = max((int(lv.max()) for lv in levels if len(lv)), default=0)
    k_cand = min(max(2 * m0, 48), 192)
    precision = "bf16" if corpus.metric == Metric.COSINE else "highest"

    glob2loc = np.full(corpus.n_pad, -1, np.int32)
    for i in range(p):
        glob2loc[rows_p[i, : counts[i]]] = np.arange(counts[i],
                                                     dtype=np.int32)

    adj0 = np.full((p, shard_size, m0), -1, np.int32)
    adju = np.full((p, max_l, shard_size, M), -1, np.int32)
    for l in range(0, max_l + 1):
        cap = m0 if l == 0 else M
        kc = k_cand if l == 0 else min(k_cand, 4 * M)
        parts = []
        members = []
        for i in range(p):
            mem = rows_p[i, : counts[i]][levels[i] >= l] if l else \
                rows_p[i, : counts[i]]
            if len(mem) >= 2:
                parts.append(i)
                members.append(mem.astype(np.int32))
        if not parts:
            continue
        _tick(f"stack_l{l}", 0.0)
        adjs = build_layers_stacked(corpus.vectors, members, cap=cap,
                                    k_cand=kc, metric=corpus.metric,
                                    precision=precision)
        _tick(f"bridge_l{l}", 0.0)
        for i, mem, adj in zip(parts, members, adjs):
            # connectivity repair per partition-layer (host-side Boruvka
            # bridging, same as build_graph's per-layer pass; already-
            # connected layers return immediately with zero device work)
            adj, _ = bridge_components(corpus.vectors, corpus.sq_norms,
                                       adj, mem, metric=corpus.metric,
                                       seed=seed + i)
            loc = np.where(adj >= 0, glob2loc[np.maximum(adj, 0)], -1)
            if l == 0:
                adj0[i, : len(mem)] = loc
            else:
                adju[i, l - 1, glob2loc[mem]] = loc
        _tick(f"bridge_l{l}", 1.0)

    # entry = a top-level node per partition (-1 for empty partitions:
    # hnsw_search_batch masks cur<0 to BIG and returns -1; clamping to 0
    # would seed the beam on a padding row whose fake id=-1 result can
    # displace real neighbors at the merge)
    entries = np.full(p, -1, np.int32)
    for i in range(p):
        if counts[i]:
            top = int(levels[i].max())
            entries[i] = int(np.nonzero(levels[i] >= top)[0][0])

    # shard vector stacking stays ON DEVICE: the earlier host-side gather
    # (np.asarray of the whole corpus) shipped 96 MB through the dev relay
    # per build — the dominant cost of the round-4 driver's 148.8 s
    # partitioned-build reading (a plain device row-gather is milliseconds)
    _tick("gather", 0.0)
    vecs, vsq = _stack_shards(corpus.vectors, corpus.sq_norms,
                              jnp.asarray(rows_p))
    vecs.block_until_ready()
    _tick("gather", 1.0)

    return PartitionedHNSWIndex(
        corpus, num_partitions=p,
        vectors_p=vecs, v_sq_p=vsq,
        rows_p=jnp.asarray(rows_p), adj0_p=jnp.asarray(adj0),
        adj_upper_p=jnp.asarray(adju), entries_p=jnp.asarray(entries),
        m=M, m0=m0, ef_construction=ef_construction, seed=seed)
