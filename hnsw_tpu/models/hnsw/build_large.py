"""Clustered HNSW construction for large corpora.

The exact all-pairs builder (build.py) is ideal up to ~100k rows; beyond
that the N^2 distance matrix stops being free. This builder bounds the
candidate generation cost to O(N * pool * D): k-means buckets the corpus
into ~`cluster_size`-row cells, and each node's exact-kNN candidate pool is
its own cell plus the `n_probe_clusters` nearest neighbor cells — the same
locality assumption IVF search exploits (ivf_flat.clj), applied to
construction. Candidates then flow through the same neighbor-selection
heuristic + reverse-edge symmetrization as the exact builder, so graph
semantics match graph.clj:163-236; only candidate *generation* is
approximate (boundary nodes may miss a few true neighbors in distant
cells — the standard trade of every bucketed ANN builder).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from hnsw_tpu.models.flat import exact_topk
from hnsw_tpu.models.hnsw.build import (
    NONE, _pow2_at_least, reverse_candidates, select_from_candidates,
)
from hnsw_tpu.ops.kmeans import train_kmeans
from hnsw_tpu.types import Corpus, Metric

# threshold at which build_graph delegates here
LARGE_N = 150_000


def build_layer_clustered(
    vectors: jnp.ndarray,     # [N_pad, D] global corpus
    v_sq: jnp.ndarray,
    member_rows: np.ndarray,  # [ns] global rows in this layer
    *,
    cap: int,
    k_cand: int,
    metric: Metric,
    cluster_size: int = 4096,
    n_probe_clusters: int = 2,
    seed: int = 42,
    tile: int = 1024,
) -> np.ndarray:
    """One-layer adjacency via bucketed candidate generation.
    Returns [ns, cap] of GLOBAL row ids (-1 padded)."""
    ns = len(member_rows)
    member_rows = np.asarray(member_rows, np.int32)
    kk = max(2, ns // cluster_size)

    # --- bucket the layer members -----------------------------------
    sub_gather = jnp.asarray(member_rows)
    sub = jnp.take(vectors, sub_gather, axis=0)
    sub_sq = jnp.take(v_sq, sub_gather, axis=0)
    cents, assign_j = train_kmeans(sub, sub_sq, ns, k=kk, seed=seed,
                                   iters=3, metric=metric)
    assign = np.asarray(assign_j)[:ns]
    cents_np = np.asarray(cents)

    # neighbor cells by centroid distance (self first)
    cd = cents_np @ cents_np.T
    csq = (cents_np * cents_np).sum(1)
    if metric == Metric.EUCLIDEAN:
        cdist = csq[:, None] + csq[None, :] - 2 * cd
    else:
        cdist = -cd / np.maximum(
            np.sqrt(csq[:, None] * csq[None, :]), 1e-12)
    np.fill_diagonal(cdist, -np.inf)      # self always first
    order = np.argsort(cdist, axis=1)
    probe = order[:, : n_probe_clusters + 1]
    probe[:, 0] = np.arange(kk)

    members = [np.nonzero(assign == c)[0] for c in range(kk)]
    cmax = max((len(m) for m in members), default=1)
    pool_pad = _pow2_at_least(max(cmax * (n_probe_clusters + 1), 2), 1024)

    fwd_local = np.full((ns, cap), NONE, np.int32)
    for c in range(kk):
        mc = members[c]
        if len(mc) == 0:
            continue
        pool = np.concatenate([members[p] for p in probe[c]])
        pool = pool[:pool_pad]
        pool_padded = np.zeros(pool_pad, np.int32)
        pool_padded[: len(pool)] = pool
        pv = jnp.take(sub, jnp.asarray(pool_padded), axis=0)
        mask = (jnp.arange(pool_pad) < len(pool))[:, None]
        pv = jnp.where(mask, pv, 0.0)
        pv_sq = jnp.sum(pv * pv, axis=-1)

        kq = min(k_cand + 1, len(pool))
        # query tiles over the cell's members
        mt = _pow2_at_least(max(len(mc), 1), min(tile, pool_pad))
        mc_padded = np.zeros(mt, np.int32)
        mc_padded[: len(mc)] = mc
        q = jnp.take(sub, jnp.asarray(mc_padded), axis=0)
        _, loc = exact_topk(pv, pv_sq, q, k=kq, n=len(pool), metric=metric)
        loc = np.asarray(loc)
        cand = np.where(loc >= 0, pool_padded[np.maximum(loc, 0)], NONE)
        sel = select_from_candidates(
            q, jnp.asarray(cand), sub, sub_sq,
            jnp.asarray(mc_padded), cap=cap, metric=metric)
        fwd_local[mc] = np.asarray(sel)[: len(mc)]

    # --- symmetrize (same as the exact builder) ----------------------
    rev_local = reverse_candidates(fwd_local, ns, rev_cap=cap)
    both = np.concatenate([fwd_local, rev_local], axis=1)
    out_local = np.full((ns, cap), NONE, np.int32)
    step = _pow2_at_least(min(tile, ns), 8)
    for start in range(0, ns, step):
        stop = min(start + step, ns)
        cand = np.full((step, both.shape[1]), NONE, np.int32)
        cand[: stop - start] = both[start:stop]
        selfi = np.full(step, NONE, np.int32)
        selfi[: stop - start] = np.arange(start, stop)
        q = jnp.take(sub, jnp.asarray(np.maximum(selfi, 0)), axis=0)
        sel = select_from_candidates(
            q, jnp.asarray(cand), sub, sub_sq, jnp.asarray(selfi),
            cap=cap, metric=metric)
        out_local[start:stop] = np.asarray(sel)[: stop - start]

    return np.where(out_local >= 0,
                    member_rows[np.maximum(out_local, 0)],
                    NONE).astype(np.int32)
