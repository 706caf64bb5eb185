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

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hnsw_tpu.models.flat import exact_topk
from hnsw_tpu.models.hnsw.build import (
    NONE, _heuristic_impl, _pairwise_among_impl, _pow2_at_least,
    reverse_candidates, select_from_candidates,
)
from hnsw_tpu.ops.distance import BIG, _dist_bc
from hnsw_tpu.ops.kmeans import train_kmeans
from hnsw_tpu.types import Corpus, Metric

# threshold at which build_graph delegates here
LARGE_N = 150_000


@partial(jax.jit, static_argnames=("cap", "kq", "metric", "tile"))
def _refine_fused(sub, sub_sq, adj, n, *, cap: int, kq: int, metric: Metric,
                  tile: int):
    """One NN-descent round over a built layer: each node's candidate pool
    is its neighbors + neighbors-of-neighbors (the 2-hop ball of the
    CURRENT graph), scored in bf16, deduped via an id-sort, trimmed to kq,
    and re-selected with the construction heuristic. Recovers the true
    neighbors the bucketed candidate generation missed across cell
    boundaries — two nodes whose cells don't probe each other still meet
    through any shared neighbor (the standard NN-descent convergence
    argument). Returns a refined FORWARD adjacency [ns_pad, cap] in local
    ids (-1 padded); the caller re-symmetrizes."""
    ns_pad = sub.shape[0]
    n = jnp.asarray(n, jnp.int32)
    sub_lp = sub.astype(jnp.bfloat16)
    num_tiles = ns_pad // tile
    big_id = jnp.int32(1 << 30)

    def body(_, ti):
        start = ti * tile
        q = jax.lax.dynamic_slice_in_dim(sub, start, tile, 0)     # [T, D]
        nb = jax.lax.dynamic_slice_in_dim(adj, start, tile, 0)    # [T, cap]
        nb2 = jnp.take(adj, jnp.maximum(nb, 0), axis=0)           # [T,cap,cap]
        nb2 = jnp.where((nb >= 0)[:, :, None], nb2, -1)
        cand = jnp.concatenate([nb, nb2.reshape(tile, cap * cap)], axis=1)
        selfi = start + jnp.arange(tile, dtype=jnp.int32)
        valid = (cand >= 0) & (cand != selfi[:, None])
        rows = jnp.maximum(cand, 0)
        cv = jnp.take(sub_lp, rows, axis=0)                       # [T, C, D]
        dots = jnp.einsum("td,tcd->tc", q.astype(jnp.bfloat16), cv,
                          preferred_element_type=jnp.float32)
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        c_sq = jnp.take(sub_sq, rows, axis=0)
        d = jnp.where(valid, _dist_bc(dots, q_sq, c_sq, metric), BIG)
        # dedupe without an O(C^2) mask (C is ~cap^2): sort by id, BIG-out
        # adjacent repeats, then sort by distance — two variadic lax.sorts,
        # no lane-axis take_along_axis inside the scan body
        key_id = jnp.where(valid, cand, big_id)
        si, sd = jax.lax.sort((key_id, d), num_keys=1)
        dup = jnp.concatenate(
            [jnp.zeros((tile, 1), bool), si[:, 1:] == si[:, :-1]], axis=1)
        sd = jnp.where(dup | (si >= big_id), BIG, sd)
        sd2, si2 = jax.lax.sort((sd, si), num_keys=1)
        d_k = sd2[:, :kq]
        cand_k = jnp.where(d_k < BIG, si2[:, :kq], -1)
        gat = jnp.take(sub_lp, jnp.maximum(cand_k, 0), axis=0)
        gsq = jnp.take(sub_sq, jnp.maximum(cand_k, 0), axis=0)
        pair_d = _pairwise_among_impl(gat, gsq, metric, "bf16")
        sel = _heuristic_impl(cand_k, d_k, pair_d, cap=cap)
        return 0, jnp.where((selfi < n)[:, None], sel, -1)

    _, out = jax.lax.scan(body, 0, jnp.arange(num_tiles, dtype=jnp.int32))
    return out.reshape(ns_pad, cap)


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
    refine_rounds: int = 1,
    seed: int = 42,
    tile: int = 1024,
) -> np.ndarray:
    """One-layer adjacency via bucketed candidate generation, optionally
    polished by refine_rounds of NN-descent (_refine_fused) — the cure for
    the boundary-node quality cap of pure bucketing (round-3: 500k recall
    plateaued at ~0.95 with the 2-probe pool).
    Returns [ns, cap] of GLOBAL row ids (-1 padded)."""
    ns = len(member_rows)
    member_rows = np.asarray(member_rows, np.int32)
    kk = max(2, ns // cluster_size)

    # --- bucket the layer members -----------------------------------
    # layer 0's member set is the identity (callers pass sorted unique
    # rows, so first==0 and last==ns-1 imply arange) — reuse the corpus
    # arrays instead of materializing a 1.5 GB copy at 500k (padding rows
    # are zero either way; every consumer masks by ns)
    if member_rows[0] == 0 and member_rows[-1] == ns - 1:
        sub, sub_sq = vectors, v_sq
    else:
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
    out_local = _symmetrize(sub, sub_sq, fwd_local, ns, cap=cap,
                            metric=metric, tile=tile)

    # --- NN-descent polish rounds ------------------------------------
    if refine_rounds > 0 and ns > cluster_size:
        rt = 512                       # [T, ~cap^2, D] gather working set
        ns_pad = ((ns + rt - 1) // rt) * rt
        sub_pad = jnp.zeros((ns_pad, sub.shape[1]),
                            sub.dtype).at[:ns].set(sub[:ns])
        sq_pad = jnp.zeros((ns_pad,), jnp.float32).at[:ns].set(sub_sq[:ns])
        for _ in range(refine_rounds):
            adj_pad = np.full((ns_pad, cap), NONE, np.int32)
            adj_pad[:ns] = out_local
            fwd2 = np.asarray(_refine_fused(
                sub_pad, sq_pad, jnp.asarray(adj_pad), ns,
                cap=cap, kq=max(64, 2 * cap), metric=metric, tile=rt))[:ns]
            out_local = _symmetrize(sub, sub_sq, fwd2, ns, cap=cap,
                                    metric=metric, tile=tile)

    return np.where(out_local >= 0,
                    member_rows[np.maximum(out_local, 0)],
                    NONE).astype(np.int32)


def _symmetrize(sub, sub_sq, fwd_local: np.ndarray, ns: int, *, cap: int,
                metric: Metric, tile: int) -> np.ndarray:
    """Reverse-edge collection + heuristic re-prune at cap (the
    graph.clj:204-236 bidirectional-connect analogue, shared by the initial
    bucketed pass and every refinement round)."""
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
    return out_local
