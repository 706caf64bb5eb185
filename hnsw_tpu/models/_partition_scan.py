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
from hnsw_tpu.ops.topk import top_k_ascending
from hnsw_tpu.types import Corpus, Metric, round_up


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
              centroids: Optional[np.ndarray] = None) -> "PartitionTable":
        """assign: int32 [n] cluster per original row (>= 0)."""
        n = corpus.n
        assign = np.asarray(assign[:n])
        k = int(assign.max()) + 1 if n else 1
        order = np.argsort(assign, kind="stable").astype(np.int32)
        counts = np.bincount(assign, minlength=k).astype(np.int32)
        starts = np.zeros(k, np.int32)
        starts[1:] = np.cumsum(counts)[:-1]
        cmax = int(round_up(max(int(counts.max()), 1), 8))

        host_vec = np.asarray(corpus.vectors)
        permuted = np.zeros((n + cmax, corpus.d_pad), np.float32)
        permuted[:n] = host_vec[order]
        perm = np.full(n + cmax, -1, np.int32)
        perm[:n] = order
        v_sq = np.zeros(n + cmax, np.float32)
        v_sq[:n] = np.asarray(corpus.sq_norms)[order]

        if centroids is None:
            cents = np.zeros((k, corpus.d_pad), np.float32)
            np.add.at(cents, assign, host_vec[:n])
            cents /= np.maximum(counts[:, None], 1)
        else:
            cents = np.zeros((k, corpus.d_pad), np.float32)
            cents[:, : centroids.shape[1]] = centroids

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


@partial(jax.jit, static_argnames=("k", "cmax", "metric"))
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
):
    """Masked slab scan over all clusters; returns (dists [B,k], original
    rows [B,k], -1 for missing)."""
    b, d = queries.shape
    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    n_clusters = starts.shape[0]

    def step(carry, c):
        best_d, best_r = carry
        start = starts[c]
        slab = jax.lax.dynamic_slice_in_dim(table_vectors, start, cmax, 0)
        slab_sq = jax.lax.dynamic_slice_in_dim(table_v_sq, start, cmax, 0)
        slab_rows = jax.lax.dynamic_slice_in_dim(table_perm, start, cmax, 0)
        local = jax.lax.broadcasted_iota(jnp.int32, (1, cmax), 1)
        valid = (local < lens[c]) & (slab_rows[None, :] >= 0)
        dots = jnp.dot(queries, slab.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        dist = distances_from_dots(dots, q_sq, slab_sq, metric)
        dist = jnp.where(valid & probe_mask[:, c][:, None], dist, BIG)
        d_all = jnp.concatenate([best_d, dist], axis=-1)
        r_all = jnp.concatenate(
            [best_r, jnp.broadcast_to(slab_rows[None, :], (b, cmax))], axis=-1)
        dk, sel = top_k_ascending(d_all, k)
        return (dk, jnp.take_along_axis(r_all, sel, axis=-1)), None

    init = (jnp.full((b, k), BIG), jnp.full((b, k), -1, jnp.int32))
    (dk, rk), _ = jax.lax.scan(step, init, jnp.arange(n_clusters))
    rk = jnp.where(dk < BIG, rk, -1)
    return dk, rk
