"""Shared partition-scan machinery for IVF-FLAT and Lightning.

The reference scans selected partitions with per-vector brute force on a
thread pool (ivf_flat.clj:217-294, lightning.clj:144-187). The TPU recast:
cluster-sorted row permutation makes every partition a contiguous slab of the
packed corpus, so a probe is a `dynamic_slice` (no gather at all); search is
a `lax.scan` over clusters where each step scores its slab against the WHOLE
query batch with one masked GEMM and merges into a running top-k. The corpus
streams HBM->MXU exactly once per batch regardless of how many queries probe
each cluster — the reason batched IVF on TPU beats per-query gathers.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hnsw_tpu.ops.distance import BIG, distances_from_dots
from hnsw_tpu.ops.topk import dedupe_ascending, top_k_ascending
from hnsw_tpu.types import Corpus, Metric, round_up


@partial(jax.jit, static_argnames=("dtype", "out_rows"))
def _permute_slab(vectors, sq_norms, order, *, dtype, out_rows):
    """Cluster-sorted slab permute, one fused device program. The cast
    happens BEFORE the gather: an eager take(...).astype(bf16) materializes
    the full f32 gather first (5.9 GB at 1M with spill — the allocation
    that HBM-OOM'd the 1M IVF build, round-5 probe r5m) where casting first
    peaks at the bf16 corpus copy + the bf16 output."""
    src = vectors.astype(dtype)
    permuted = jnp.zeros((out_rows, vectors.shape[1]), dtype)
    permuted = permuted.at[: order.shape[0]].set(
        jnp.take(src, order, axis=0))
    v_sq = jnp.zeros((out_rows,), jnp.float32).at[: order.shape[0]].set(
        jnp.take(sq_norms, order, axis=0))
    return permuted, v_sq


@dataclasses.dataclass
class PartitionTable:
    """Cluster-sorted slab layout over a corpus."""

    vectors: jnp.ndarray    # [N_slab, D] permuted + cmax guard rows of zeros
    v_sq: jnp.ndarray       # [N_slab]
    perm: jnp.ndarray       # int32 [N_slab] original row per position (-1 pad)
    starts: jnp.ndarray     # int32 [K]
    lens: jnp.ndarray       # int32 [K]
    centroids: jnp.ndarray  # [K, D]
    cmax: int               # max cluster size (padded slab width)
    k_parts: int

    @classmethod
    def build(cls, corpus: Corpus, assign: np.ndarray,
              centroids: Optional[np.ndarray] = None,
              secondary: Optional[np.ndarray] = None,
              dtype=jnp.float32) -> "PartitionTable":
        """assign: int32 [n] primary cluster per original row (>= 0).
        secondary: optional int32 [n] spill cluster (-1 = none) — SOAR-style
        multi-assignment: the row is stored in BOTH slabs so a missed
        primary probe can still find it (duplicates are removed at the
        search merge by dedupe_ascending).
        dtype: slab storage dtype. bf16 halves the permuted copy — the
        difference between IVF fitting 1M rows on a 16 GB chip or not (the
        f32 spill table at 1M is 5.9 GB and HBM-OOMs next to the corpus,
        scripts round-5 probe r5m). For cosine/dot the grouped scan already
        SCORES slabs in bf16, so a bf16-stored table changes nothing but
        memory; v_sq stays f32-exact either way. Keep f32 for euclidean
        (its exact path needs HIGHEST-precision slab dots)."""
        n = corpus.n
        assign = np.asarray(assign[:n])
        if centroids is not None:
            k = int(centroids.shape[0])
        else:
            k = int(assign.max()) + 1 if n else 1

        rows = np.arange(n, dtype=np.int32)
        clusters = assign.astype(np.int64)
        if secondary is not None:
            sec = np.asarray(secondary[:n])
            keep = sec >= 0
            rows = np.concatenate([rows, rows[keep]])
            clusters = np.concatenate([clusters, sec[keep].astype(np.int64)])
        m = len(rows)

        sort = np.argsort(clusters, kind="stable")
        order = rows[sort]
        counts = np.bincount(clusters, minlength=k).astype(np.int32)
        starts = np.zeros(k, np.int32)
        starts[1:] = np.cumsum(counts)[:-1]
        cmax = int(round_up(max(int(counts.max()), 1), 8))

        # permute ON DEVICE: only the int32 order array crosses the link.
        # (An earlier host permutation pulled the whole corpus through the
        # relay and back — ~2x 1.5 GB at 500k, the dominant cost of a
        # 1,400 s IVF build; the device row gather is milliseconds.)
        order_j = jnp.asarray(order)
        permuted, v_sq = _permute_slab(corpus.vectors, corpus.sq_norms,
                                       order_j, dtype=dtype,
                                       out_rows=m + cmax)
        perm = np.full(m + cmax, -1, np.int32)
        perm[:m] = order

        if centroids is None:
            # mean of member rows per cluster: one-hot GEMM on device
            a_j = jnp.asarray(assign.astype(np.int32))
            onehot = jax.nn.one_hot(a_j, k, dtype=jnp.float32)
            sums = jnp.dot(onehot.T, corpus.vectors[:n],
                           preferred_element_type=jnp.float32)
            pc = np.bincount(assign, minlength=k)
            cents = sums / jnp.maximum(
                jnp.asarray(pc, jnp.float32)[:, None], 1.0)
        else:
            cents = np.zeros((k, corpus.d_pad), np.float32)
            cents[:, : centroids.shape[1]] = centroids
            cents = jnp.asarray(cents)

        return cls(
            vectors=jnp.asarray(permuted), v_sq=jnp.asarray(v_sq),
            perm=jnp.asarray(perm), starts=jnp.asarray(starts),
            lens=jnp.asarray(counts), centroids=jnp.asarray(cents),
            cmax=cmax, k_parts=k,
        )

    def partition_sizes(self) -> np.ndarray:
        return np.asarray(self.lens)


@partial(jax.jit, static_argnames=("num_probes", "metric"))
def probe_mask_from_centroids(
    queries: jnp.ndarray,    # [B, D]
    centroids: jnp.ndarray,  # [K, D]
    *,
    num_probes: int,
    metric: Metric,
):
    """Rank centroids per query, probe the closest num_probes
    (ivf_flat.clj:261-272). Returns (mask bool[B, K], probe_ids [B, P])."""
    c_sq = jnp.sum(centroids * centroids, axis=-1)
    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    dots = jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    dist = distances_from_dots(dots, q_sq, c_sq, metric)
    k = centroids.shape[0]
    p = min(num_probes, k)
    _, probe_ids = top_k_ascending(dist, p)
    mask = jnp.zeros((queries.shape[0], k), bool)
    mask = jax.vmap(lambda m, i: m.at[i].set(True))(mask, probe_ids)
    return mask, probe_ids


@partial(jax.jit, static_argnames=("k", "cmax", "metric", "dedup"))
def scan_search(
    table_vectors: jnp.ndarray,  # [N_slab, D]
    table_v_sq: jnp.ndarray,     # [N_slab]
    table_perm: jnp.ndarray,     # [N_slab] int32
    starts: jnp.ndarray,         # [K]
    lens: jnp.ndarray,           # [K]
    probe_mask: jnp.ndarray,     # [B, K] bool
    queries: jnp.ndarray,        # [B, D]
    *,
    k: int,
    cmax: int,
    metric: Metric,
    dedup: bool = False,         # True when the table was built with spill
):
    """Masked slab scan over all clusters; returns (dists [B,k], original
    rows [B,k], -1 for missing)."""
    b, d = queries.shape
    q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    n_clusters = starts.shape[0]
    # bf16-stored tables score in bf16 (their values already carry bf16
    # rounding; HIGHEST would only slow the matmul 6x)
    lp = table_vectors.dtype == jnp.bfloat16
    q_mat = queries.astype(jnp.bfloat16) if lp else queries
    # spilled tables hold each row in up to 2 slabs: carry 2k slots so k
    # unique survivors are guaranteed, dedupe at the end
    kk = 2 * k if dedup else k

    def step(carry, c):
        best_d, best_r = carry
        start = starts[c]
        slab = jax.lax.dynamic_slice_in_dim(table_vectors, start, cmax, 0)
        slab_sq = jax.lax.dynamic_slice_in_dim(table_v_sq, start, cmax, 0)
        slab_rows = jax.lax.dynamic_slice_in_dim(table_perm, start, cmax, 0)
        local = jax.lax.broadcasted_iota(jnp.int32, (1, cmax), 1)
        valid = (local < lens[c]) & (slab_rows[None, :] >= 0)
        dots = jnp.dot(q_mat, slab.T, preferred_element_type=jnp.float32,
                       precision=None if lp else jax.lax.Precision.HIGHEST)
        dist = distances_from_dots(dots, q_sq, slab_sq, metric)
        dist = jnp.where(valid & probe_mask[:, c][:, None], dist, BIG)
        d_all = jnp.concatenate([best_d, dist], axis=-1)
        r_all = jnp.concatenate(
            [best_r, jnp.broadcast_to(slab_rows[None, :], (b, cmax))], axis=-1)
        dk, sel = top_k_ascending(d_all, kk)
        return (dk, jnp.take_along_axis(r_all, sel, axis=-1)), None

    init = (jnp.full((b, kk), BIG), jnp.full((b, kk), -1, jnp.int32))
    (dk, rk), _ = jax.lax.scan(step, init, jnp.arange(n_clusters))
    if dedup:
        dk, rk = dedupe_ascending(dk, rk, k)
    rk = jnp.where(dk < BIG, rk, -1)
    return dk, rk


@partial(jax.jit,
         static_argnames=("k", "cmax", "qcap", "metric", "precision"))
def grouped_search(
    table_vectors: jnp.ndarray,  # [N_slab, D]
    table_v_sq: jnp.ndarray,     # [N_slab]
    table_perm: jnp.ndarray,     # [N_slab] int32
    starts: jnp.ndarray,         # [K]
    lens: jnp.ndarray,           # [K]
    probe_ids: jnp.ndarray,      # [B, P] int32, ascending by centroid dist
    queries: jnp.ndarray,        # [B, D]
    *,
    k: int,
    cmax: int,
    qcap: int,
    metric: Metric,
    precision: str = "default",
):
    """Compute-skipping probe scan: group queries BY CLUSTER, score each slab
    only against the queries that probe it.

    The masked scan above streams the whole corpus through the MXU per batch
    — simple, but probes never reduce compute, so IVF can't beat the flat
    scan. Here each cluster's slab is scored once against a gathered [qcap]
    query block, so FLOPs scale with the probed fraction (K*qcap*cmax*D vs
    B*N*D) while HBM traffic stays one corpus stream per batch. This is the
    batched TPU answer to the reference's per-query probe loop
    (ivf_flat.clj:261-288).

    qcap bounds the per-cluster query group. Pairs beyond qcap are dropped
    FARTHEST-PROBE-FIRST (pairs are ranked by probe order within a cluster),
    so recall degrades gracefully under probe skew; the drop count is
    returned — never silently capped. Returns (dists [B,k], rows [B,k],
    dropped_pairs scalar int32).
    """
    b, d = queries.shape
    p = probe_ids.shape[1]
    n_clusters = starts.shape[0]
    kq = min(k, cmax)

    flat_c = probe_ids.reshape(-1).astype(jnp.int32)       # [B*P], b-major
    rank = (jnp.arange(b * p, dtype=jnp.int32) % p)
    # group by cluster; within a cluster, near probes (low rank) first so
    # qcap overflow sheds the farthest probes
    key = flat_c * p + rank
    order = jnp.argsort(key)
    sc = flat_c[order]                                     # sorted clusters
    sb = (order // p).astype(jnp.int32)                    # query per pair
    firsts = jnp.searchsorted(sc, jnp.arange(n_clusters, dtype=sc.dtype),
                              side="left")
    pos = jnp.arange(b * p, dtype=jnp.int32) - firsts[sc].astype(jnp.int32)
    ok = pos < qcap
    lin = jnp.where(ok, sc * qcap + pos, n_clusters * qcap)  # last = dump
    qslot = (jnp.full((n_clusters * qcap + 1,), -1, jnp.int32)
             .at[lin].set(sb)[:-1].reshape(n_clusters, qcap))
    pairslot = (jnp.full((n_clusters * qcap + 1,), b * p, jnp.int32)
                .at[lin].set(order.astype(jnp.int32))[:-1]
                .reshape(n_clusters, qcap))
    dropped = (b * p) - jnp.sum(ok.astype(jnp.int32))

    q_sq_all = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1)   # [B]
    # a bf16-STORED table forces the bf16 scoring path regardless of the
    # requested precision (its values already carry bf16 rounding)
    lp = precision != "highest" or table_vectors.dtype == jnp.bfloat16
    q_mat = queries.astype(jnp.bfloat16) if lp else queries
    t_mat = table_vectors.astype(jnp.bfloat16) if lp else table_vectors

    def step(carry, c):
        out_d, out_r = carry                               # [B*P+1, kq]
        qi = qslot[c]                                      # [qcap]
        # gather-as-GEMM: jnp.take of qcap scattered query rows lowers to
        # one unpipelined DMA per row (~1 us each; ~81k rows per batch at
        # 100k/P=12 — the dominant cost of this scan measured in situ). A
        # one-hot matmul moves the same rows through the MXU instead.
        # qi = -1 slots produce an all-zero row and are masked below.
        oh = qi[:, None] == jnp.arange(b, dtype=jnp.int32)[None, :]
        # one nonzero per row => the "sum" is an exact copy in bf16; the f32
        # (highest-precision) path must pin HIGHEST or the matmul would
        # round the gathered values to bf16-class mantissas
        qg = jnp.dot(oh.astype(q_mat.dtype), q_mat,
                     preferred_element_type=q_mat.dtype,
                     precision=None if lp else jax.lax.Precision.HIGHEST)
        q_sq = jnp.dot(oh.astype(jnp.float32), q_sq_all,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)[:, None]
        start = starts[c]
        slab = jax.lax.dynamic_slice_in_dim(t_mat, start, cmax, 0)
        slab_sq = jax.lax.dynamic_slice_in_dim(table_v_sq, start, cmax, 0)
        slab_rows = jax.lax.dynamic_slice_in_dim(table_perm, start, cmax, 0)
        local = jax.lax.broadcasted_iota(jnp.int32, (1, cmax), 1)
        valid = ((local < lens[c]) & (slab_rows[None, :] >= 0)
                 & (qi >= 0)[:, None])
        if lp:
            dots = jnp.dot(qg, slab.T, preferred_element_type=jnp.float32)
        else:
            dots = jnp.dot(qg, slab.T, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        dist = distances_from_dots(dots, q_sq, slab_sq, metric)
        dist = jnp.where(valid, dist, BIG)
        dloc, iloc = top_k_ascending(dist, kq)             # [qcap, kq]
        rows = jnp.take(slab_rows, iloc)
        rows = jnp.where(dloc < BIG, rows, -1)
        ps = pairslot[c]
        out_d = out_d.at[ps].set(dloc)
        out_r = out_r.at[ps].set(rows)
        return (out_d, out_r), None

    init = (jnp.full((b * p + 1, kq), BIG),
            jnp.full((b * p + 1, kq), -1, jnp.int32))
    (od, orows), _ = jax.lax.scan(step, init, jnp.arange(n_clusters))
    od = od[:-1].reshape(b, p * kq)
    orows = orows[:-1].reshape(b, p * kq)
    if p * kq < k:   # fewer candidates than requested (tiny tables)
        od = jnp.pad(od, ((0, 0), (0, k - p * kq)), constant_values=BIG)
        orows = jnp.pad(orows, ((0, 0), (0, k - p * kq)), constant_values=-1)
    # dedupe: spilled rows (and any future multi-probe overlap) appear once
    # per probed slab
    dk, rk = dedupe_ascending(od, orows, k)
    rk = jnp.where(dk < BIG, rk, -1)
    return dk, rk, dropped


def default_qcap(b: int, p: int, k_parts: int) -> int:
    """Per-cluster query-group capacity: ~4x the uniform expectation,
    power-of-two bucketed (compile-cache friendly), never above B."""
    avg = max(1, (b * p + k_parts - 1) // k_parts)
    cap = 1
    while cap < 4 * avg:
        cap *= 2
    return max(8, min(cap, b))
