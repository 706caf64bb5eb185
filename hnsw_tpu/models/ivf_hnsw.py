"""IVF-HNSW: k-means partitions with a graph per cluster.

Reference: src/hnsw/ann/hybrid/ivf_hnsw.clj — k-means++ + Lloyd partitioning
(:34-143, duplicated from ivf_flat), a pure HNSW built per partition
(:236-251), search probes num-probes nearest centroids and runs graph search
in each with per-mode ef, fetching 2k per cluster then a global top-k
(:279-326). Modes :turbo (1 probe, ef 50) ... :precise (5, 300) (:286-290).
(The reference file itself cannot load due to a stale require — SURVEY.md
§2.9 —; this reproduces its documented capability, not its wiring.)

TPU design: all per-cluster graphs live in ONE global adjacency table whose
edges never cross cluster boundaries (disjoint subgraphs), each cluster
anchored at its medoid. A probe seeds a virtual query at the medoid, so a
B-query / p-probe search is a single batched beam search over B*p virtual
queries — same kernel as plain HNSW, different entry points.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from hnsw_tpu.config import IVF_HNSW_MODES, Mode
from hnsw_tpu.models._partition_scan import probe_mask_from_centroids
from hnsw_tpu.models.base import ANNIndex
from hnsw_tpu.models.common import as_corpus
from hnsw_tpu.models.hnsw.build import build_layers_stacked
from hnsw_tpu.models.hnsw.search import hnsw_search_batch
from hnsw_tpu.ops.kmeans import balanced_assign, topc_clusters, train_kmeans
from hnsw_tpu.types import Corpus, Metric


class IVFHNSWIndex(ANNIndex):
    family = "ivf_hnsw"

    qps_scan_safe = False  # hop-loop program: see bench/harness.py

    # same budget rule as HNSWIndex: the packed-neighborhood bf16 table
    # costs M0 x bytes(bf16 corpus) of extra HBM
    PACK_BYTES_CAP = 6 << 30

    # sampled member rows per cluster, seeded alongside the medoid: a tight
    # k-means cell is still ~1000 rows, and a single-entry probe inside a
    # SHARED beam under-explores it (measured 31k: medoid-only seeding lost
    # ~8 recall points vs the per-probe virtual-query fan-out)
    SAMPLES_PER_CLUSTER = 8
    SEEDS_PER_PROBE = 3     # top sample seeds added per probed cluster

    def __init__(self, corpus: Corpus, *, centroids, medoids, adj0,
                 num_partitions: int, m: int, seed: int = 42,
                 expand: int = 8, samples=None):
        # expand=8 (hop width c=256): halves the shared multi-entry beam's
        # hop count; Pallas-eligible since the round-5 VMEM recalibration
        # (ops/pallas_hop.py) — measured 21.1k QPS @ 0.950 vs 17.8k @ 0.939
        # at expand=4 (scripts/_probe_r5c.py)
        super().__init__(corpus)
        self.centroids = centroids     # [K, D]
        self.medoids = medoids         # int32 [K] entry row per cluster
        self.adj0 = adj0               # [N_pad, M0] cluster-local edges
        self.num_partitions = num_partitions
        self.m = m
        self.seed = seed
        self.expand = expand
        # [K, SAMPLES_PER_CLUSTER] evenly-spaced member rows (-1 pad);
        # derived from adj0 cluster membership when absent (legacy states)
        self.samples = samples
        self._vec_lp = None
        self._nbr_pack = None
        self._nbr_sq = None

    def search_batch(self, queries, k: int, mode: Mode = Mode.BALANCED,
                     num_probes: Optional[int] = None,
                     ef: Optional[int] = None,
                     search_percent: Optional[float] = None):
        q = self.corpus.pad_queries(queries)
        mode = Mode.coerce(mode)
        probes_m, ef_m = IVF_HNSW_MODES[mode]
        if search_percent is not None and num_probes is None:
            # legacy float search-percent -> probe count (ivf_hnsw.clj:349-353)
            num_probes = max(1, round(search_percent * self.num_partitions))
        p = min(num_probes or probes_m, self.num_partitions)
        ef = max(ef or ef_m, k)

        _, probe_ids = probe_mask_from_centroids(
            q, self.centroids, num_probes=p, metric=self.corpus.metric)
        entries = jnp.take(self.medoids, probe_ids, axis=0)   # [B, p]
        if self.samples is not None and self.SEEDS_PER_PROBE > 0:
            # per-probed-cluster sampled seeds on top of the medoid: one
            # [B, K*S] GEMM over every cluster's sample rows, top-R within
            # each cluster block, gathered at the probed cluster ids
            from hnsw_tpu.models.hnsw.search import sample_entries_grouped
            b = q.shape[0]
            tops = sample_entries_grouped(
                self.corpus.vectors, self.corpus.sq_norms, self.samples, q,
                metric=self.corpus.metric,
                r=self.SEEDS_PER_PROBE).reshape(b, self.samples.shape[0], -1)
            probed = jnp.take_along_axis(
                tops, probe_ids[:, :, None], axis=1)          # [B, p, R]
            entries = jnp.concatenate(
                [entries, probed.reshape(b, -1)], axis=1)
        # ONE shared beam per query, multi-seeded at the p probe medoids
        # (hnsw_search_batch multi-entry path): the p probed subgraphs
        # compete inside a single ef-wide beam instead of p independent
        # ef-wide virtual-query searches — ~p x less hop work and a natural
        # cross-probe early exit (a probe whose cluster is far gets evicted
        # after one expansion). Same in-loop fast path as HNSWIndex: bf16
        # shadow + packed-neighborhood ring-DMA kernel (the per-cluster
        # subgraphs share one global adjacency, so the machinery is
        # identical).
        from hnsw_tpu.models.hnsw.search import prepare_hop_fast_path
        no_upper = jnp.zeros((0,) + self.adj0.shape, jnp.int32)[:, :, : self.m]
        kw = prepare_hop_fast_path(self, self.corpus, self.adj0,
                                   expand=self.expand, ef=ef,
                                   pack_bytes_cap=self.PACK_BYTES_CAP)
        return hnsw_search_batch(
            self.corpus.vectors, self.corpus.sq_norms,
            self.adj0, no_upper, entries, q,
            k=k, ef=ef, metric=self.corpus.metric, rerank=4 * k, **kw)

    def index_info(self) -> Dict[str, Any]:
        return {
            "type": self.family,
            "num_vectors": self.corpus.n,
            "dimensions": self.corpus.dim,
            "metric": self.corpus.metric.value,
            "num_partitions": self.num_partitions,
            "M": self.m,
        }

    def to_state(self) -> Dict[str, Any]:
        return {
            "params": {"num_partitions": self.num_partitions, "M": self.m,
                       "seed": self.seed, "expand": self.expand},
            "arrays": {"centroids": np.asarray(self.centroids),
                       "medoids": np.asarray(self.medoids),
                       "adj0": np.asarray(self.adj0),
                       **({"samples": np.asarray(self.samples)}
                          if self.samples is not None else {})},
        }

    @classmethod
    def from_state(cls, corpus: Corpus, state: Dict[str, Any]) -> "IVFHNSWIndex":
        p, a = state["params"], state["arrays"]
        return cls(corpus, centroids=jnp.asarray(a["centroids"]),
                   medoids=jnp.asarray(a["medoids"]),
                   adj0=jnp.asarray(a["adj0"]),
                   num_partitions=int(p["num_partitions"]), m=int(p["M"]),
                   seed=int(p.get("seed", 42)),
                   expand=int(p.get("expand", 4)),
                   samples=(jnp.asarray(a["samples"])
                            if "samples" in a else None))


def build_ivf_hnsw_index(
    data,
    *,
    num_partitions: int = 16,
    M: int = 16,
    max_iterations: int = 10,
    metric="cosine",
    ids=None,
    seed: int = 42,
    **_ignored,
) -> IVFHNSWIndex:
    corpus = as_corpus(data, metric=metric, ids=ids)
    n = corpus.n
    kparts = max(1, min(num_partitions, max(n, 1)))
    m0 = 2 * M

    if n == 0:
        return IVFHNSWIndex(
            corpus, centroids=jnp.zeros((kparts, corpus.d_pad)),
            medoids=jnp.zeros(kparts, jnp.int32),
            adj0=jnp.full((corpus.n_pad, m0), -1, jnp.int32),
            num_partitions=kparts, m=M, seed=seed)

    cents_j, assign_j = train_kmeans(
        corpus.vectors, corpus.sq_norms, n, k=kparts, seed=seed,
        iters=max_iterations, metric=corpus.metric)
    cents = np.asarray(cents_j)
    if kparts > 1:
        # balanced reassignment (ops/kmeans.py) keeps cluster sizes within
        # ~1.25x of the mean: near-equal probe cost, and the stacked build
        # below pads every cluster to the LARGEST one's power-of-two
        topd, topi = topc_clusters(corpus.vectors, corpus.sq_norms, n,
                                   cents_j, c=min(4, kparts),
                                   metric=corpus.metric)
        cap_sz = int(np.ceil(1.25 * n / kparts))
        assign = balanced_assign(topd, topi, kparts, cap_sz)
    else:
        assign = np.asarray(assign_j)[:n]

    # medoid per cluster = member closest to its centroid (cluster entry
    # point): distances computed on device, one small [n] fetch
    a_dev = jnp.asarray(assign)
    own = jnp.take(cents_j, a_dev, axis=0)
    d2 = (corpus.sq_norms[:n]
          - 2.0 * jnp.einsum("nd,nd->n", corpus.vectors[:n, : cents.shape[1]],
                             own, preferred_element_type=jnp.float32)
          + jnp.sum(own * own, axis=-1))
    d2 = np.asarray(d2)
    medoids = np.zeros(kparts, np.int32)
    member_sets = []
    for c in range(kparts):
        members = np.nonzero(assign == c)[0].astype(np.int32)
        member_sets.append(members)
        if len(members):
            medoids[c] = members[int(np.argmin(d2[members]))]

    # evenly-spaced member-row sample per cluster: search-time seeds
    s_pc = IVFHNSWIndex.SAMPLES_PER_CLUSTER
    samples = np.full((kparts, s_pc), -1, np.int32)
    for ci, members in enumerate(member_sets):
        if len(members):
            sel = np.unique(np.linspace(0, len(members) - 1,
                                        min(s_pc, len(members))).astype(int))
            samples[ci, : len(sel)] = members[sel]

    # all per-cluster sub-graphs build as ONE stacked dispatch (the
    # reference runs one ForkJoinPool task per cluster, ivf_hnsw.clj:236-251;
    # a host loop of per-cluster device programs is the per-item dispatch
    # pattern the TPU design forbids)
    adj0 = np.full((corpus.n_pad, m0), -1, np.int32)
    adjs = build_layers_stacked(
        corpus.vectors, member_sets, cap=m0, k_cand=2 * m0,
        metric=corpus.metric,
        precision="highest" if n <= 50000 else "bf16")
    for members, adj in zip(member_sets, adjs):
        if len(members) > 1:
            adj0[members] = adj

    return IVFHNSWIndex(
        corpus, centroids=jnp.asarray(cents),
        medoids=jnp.asarray(medoids), adj0=jnp.asarray(adj0),
        num_partitions=kparts, m=M, seed=seed,
        samples=jnp.asarray(samples))
