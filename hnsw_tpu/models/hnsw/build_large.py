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

Orchestration (round 5): the whole layer stays ON DEVICE end to end. The
per-cell pass is one fused dispatch per cell scattered into a device
adjacency (no per-cell host syncs — the round-4 builder paid 2 synchronous
relay round-trips per cell), symmetrization is one fused scan dispatch (the
round-4 version looped ~ns/1024 synced `select_from_candidates` calls: at
500k that was ~1,500 relay round-trips across its three invocations), and
the adjacency crosses to the host exactly once at the end. Scoring runs at
bf16 for cosine (the candidate sets are rank-robust; round-4 scored cells
and symmetrization with 6-pass f32 GEMMs).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hnsw_tpu.models.hnsw.build import (
    NONE, _heuristic_impl, _pairwise_among_impl, _pow2_at_least,
    _select_sorted_impl,
)
from hnsw_tpu.ops.distance import BIG, _dist_bc
from hnsw_tpu.ops.kmeans import train_kmeans
from hnsw_tpu.ops.topk import top_k_ascending
from hnsw_tpu.types import Metric

# threshold at which build_graph delegates here
LARGE_N = 150_000

_BIG_ID = jnp.int32(1 << 30)


@partial(jax.jit, static_argnames=("cap", "kq", "metric", "precision"))
def _cell_build(src, src_sq, pool_rows, mc_rows, n_pool, *, cap: int,
                kq: int, metric: Metric, precision: str):
    """Forward adjacency for one cell, one dispatch: scan the cell's probe
    pool (cell + neighbor cells), take the top-kq exact candidates, run the
    construction heuristic. src is the (padded) layer vector array — bf16
    for the cosine fast path, f32 for "highest". pool_rows [P_pad] / mc_rows
    [MT] are LOCAL layer ids, -1 padded. Returns sel [MT, cap] local ids."""
    n_pool = jnp.asarray(n_pool, jnp.int32)
    pv = jnp.take(src, jnp.maximum(pool_rows, 0), axis=0)      # [P_pad, D]
    pv_sq = jnp.take(src_sq, jnp.maximum(pool_rows, 0), axis=0)
    live_pool = (jnp.arange(pool_rows.shape[0]) < n_pool) & (pool_rows >= 0)
    q = jnp.take(src, jnp.maximum(mc_rows, 0), axis=0)         # [MT, D]
    q_sq = jnp.take(src_sq, jnp.maximum(mc_rows, 0), axis=0)[:, None]
    if precision == "bf16":
        dots = jnp.dot(q.astype(jnp.bfloat16), pv.astype(jnp.bfloat16).T,
                       preferred_element_type=jnp.float32)
    else:
        dots = jnp.dot(q, pv.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    dist = _dist_bc(dots, q_sq, pv_sq[None, :], metric)        # [MT, P_pad]
    dist = jnp.where(live_pool[None, :], dist, BIG)
    dist = jnp.where(pool_rows[None, :] == mc_rows[:, None], BIG, dist)
    d_cand, idx = top_k_ascending(dist, kq)
    cand = jnp.where(d_cand < BIG, jnp.take(pool_rows, idx), -1)
    sel, _ = _select_sorted_impl(cand, d_cand, src, src_sq, cap=cap,
                                 metric=metric, precision=precision)
    return jnp.where((mc_rows >= 0)[:, None], sel, -1)


@jax.jit
def _scatter_rows(fwd, idx, vals):
    """fwd[idx] = vals with -1 / out-of-range indices dropped (NOT clipped:
    a clipped pad index would silently overwrite the last row)."""
    safe = jnp.where(idx >= 0, idx, fwd.shape[0])
    return fwd.at[safe].set(vals, mode="drop")


@partial(jax.jit, static_argnames=("cap", "metric", "tile", "precision"))
def _symmetrize_fused(src, src_sq, fwd, n, *, cap: int, metric: Metric,
                      tile: int, precision: str):
    """Reverse-edge collection + heuristic re-prune at cap, entirely on
    device (the graph.clj:204-236 bidirectional-connect analogue): device
    reverse edges, then a lax.scan over node tiles scoring [fwd ++ rev]
    against each node, id-sort dedupe, distance sort, heuristic. One
    dispatch; the adjacency never visits the host."""
    from hnsw_tpu.models.hnsw.build import _reverse_device

    ns_pad = fwd.shape[0]
    n = jnp.asarray(n, jnp.int32)
    num_tiles = ns_pad // tile
    rev, _ = _reverse_device(fwd, jnp.zeros(fwd.shape, jnp.float32),
                             rev_cap=cap)

    def body(_, ti):
        start = ti * tile
        cand = jnp.concatenate([
            jax.lax.dynamic_slice_in_dim(fwd, start, tile, 0),
            jax.lax.dynamic_slice_in_dim(rev, start, tile, 0),
        ], axis=1)                                             # [T, 2cap]
        selfi = start + jnp.arange(tile, dtype=jnp.int32)
        valid = (cand >= 0) & (cand != selfi[:, None]) \
            & (selfi < n)[:, None]
        q = jax.lax.dynamic_slice_in_dim(src, start, tile, 0)
        q_sq = jax.lax.dynamic_slice_in_dim(src_sq, start, tile, 0)[:, None]
        cv = jnp.take(src, jnp.maximum(cand, 0), axis=0)       # [T, 2cap, D]
        if precision == "bf16":
            dots = jnp.einsum("td,tcd->tc", q.astype(jnp.bfloat16),
                              cv.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        else:
            dots = jnp.einsum("td,tcd->tc", q, cv,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        c_sq = jnp.take(src_sq, jnp.maximum(cand, 0), axis=0)
        d = jnp.where(valid, _dist_bc(dots, q_sq, c_sq, metric), BIG)
        # dedupe: id-sort, BIG-out adjacent repeats, distance sort — two
        # variadic sorts, no lane-axis take_along_axis in the scan body
        key_id = jnp.where(valid, cand, _BIG_ID)
        si, sd = jax.lax.sort((key_id, d), num_keys=1)
        dup = jnp.concatenate(
            [jnp.zeros((tile, 1), bool), si[:, 1:] == si[:, :-1]], axis=1)
        sd = jnp.where(dup | (si >= _BIG_ID), BIG, sd)
        sd2, si2 = jax.lax.sort((sd, si), num_keys=1)
        cand2 = jnp.where(sd2 < BIG, si2, -1)
        sel, _ = _select_sorted_impl(cand2, sd2, src, src_sq, cap=cap,
                                     metric=metric, precision=precision)
        return 0, jnp.where((selfi < n)[:, None], sel, -1)

    _, out = jax.lax.scan(body, 0, jnp.arange(num_tiles, dtype=jnp.int32))
    return out.reshape(ns_pad, cap)


@partial(jax.jit, static_argnames=("cap", "kq", "metric", "tile"))
def _refine_fused(src, src_sq, adj, n, *, cap: int, kq: int, metric: Metric,
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
    ns_pad = src.shape[0]
    n = jnp.asarray(n, jnp.int32)
    sub_lp = src if src.dtype == jnp.bfloat16 else src.astype(jnp.bfloat16)
    num_tiles = ns_pad // tile

    def body(_, ti):
        start = ti * tile
        q = jax.lax.dynamic_slice_in_dim(src, start, tile, 0)     # [T, D]
        q_sq = jax.lax.dynamic_slice_in_dim(src_sq, start, tile, 0)[:, None]
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
        c_sq = jnp.take(src_sq, rows, axis=0)
        d = jnp.where(valid, _dist_bc(dots, q_sq, c_sq, metric), BIG)
        # dedupe without an O(C^2) mask (C is ~cap^2): sort by id, BIG-out
        # adjacent repeats, then sort by distance — two variadic lax.sorts,
        # no lane-axis take_along_axis inside the scan body
        key_id = jnp.where(valid, cand, _BIG_ID)
        si, sd = jax.lax.sort((key_id, d), num_keys=1)
        dup = jnp.concatenate(
            [jnp.zeros((tile, 1), bool), si[:, 1:] == si[:, :-1]], axis=1)
        sd = jnp.where(dup | (si >= _BIG_ID), BIG, sd)
        sd2, si2 = jax.lax.sort((sd, si), num_keys=1)
        d_k = sd2[:, :kq]
        cand_k = jnp.where(d_k < BIG, si2[:, :kq], -1)
        gat = jnp.take(sub_lp, jnp.maximum(cand_k, 0), axis=0)
        gsq = jnp.take(src_sq, jnp.maximum(cand_k, 0), axis=0)
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
    precision: str = "bf16",
    progress=None,            # callable(stage, frac): "large_kmeans",
                              # "large_cells", "large_sym{i}",
                              # "large_refine{i}", "large_fetch"
) -> np.ndarray:
    """One-layer adjacency via bucketed candidate generation, optionally
    polished by refine_rounds of NN-descent (_refine_fused) — the cure for
    the boundary-node quality cap of pure bucketing (round-3: 500k recall
    plateaued at ~0.95 with the 2-probe pool).
    Returns [ns, cap] of GLOBAL row ids (-1 padded)."""
    def _tick(stage, frac=0.0):
        if progress is not None:
            progress(stage, frac)

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
    _tick("large_kmeans")
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

    # one padded score array serves every fused pass: bf16 for the cosine
    # fast path (half the gather bytes of f32), f32 for "highest"
    ns_pad = ((ns + tile - 1) // tile) * tile
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    src = jnp.zeros((ns_pad, sub.shape[1]), dt).at[:ns].set(
        sub[:ns].astype(dt))
    src_sq = jnp.zeros((ns_pad,), jnp.float32).at[:ns].set(sub_sq[:ns])

    # --- per-cell candidate pass: all dispatches queued, ZERO host syncs.
    # The cells' pool/member id arrays ship host->device in ONE stacked
    # upload: two small per-cell jnp.asarray transfers paid ~90 ms of relay
    # latency each — 22 s of the 500k build (round-5 rehearsal,
    # scripts/_probe_r5d.py) — while one [kk, pool_pad] upload is ~8 MB.
    _tick("large_cells")
    fwd = jnp.full((ns_pad, cap), NONE, jnp.int32)
    kq = min(k_cand + 1, pool_pad)
    live_cells = [c for c in range(kk) if len(members[c])]
    mt = _pow2_at_least(max((len(members[c]) for c in live_cells),
                            default=1), min(tile, pool_pad))
    pool_all = np.full((len(live_cells), pool_pad), NONE, np.int32)
    mc_all = np.full((len(live_cells), mt), NONE, np.int32)
    n_pools = []
    for i, c in enumerate(live_cells):
        pool = np.concatenate([members[p] for p in probe[c]])[:pool_pad]
        pool_all[i, : len(pool)] = pool
        mc_all[i, : len(members[c])] = members[c]
        n_pools.append(len(pool))
    pool_dev = jnp.asarray(pool_all)
    mc_dev = jnp.asarray(mc_all)
    for i in range(len(live_cells)):
        sel = _cell_build(src, src_sq, pool_dev[i], mc_dev[i], n_pools[i],
                          cap=cap, kq=kq, metric=metric, precision=precision)
        fwd = _scatter_rows(fwd, mc_dev[i], sel)

    # --- symmetrize + NN-descent polish, all on device ----------------
    _tick("large_sym0")
    out = _symmetrize_fused(src, src_sq, fwd, ns, cap=cap, metric=metric,
                            tile=tile, precision=precision)
    if refine_rounds > 0 and ns > cluster_size:
        rt = 512                       # [T, ~cap^2, D] gather working set
        for i in range(refine_rounds):
            _tick(f"large_refine{i + 1}")
            fwd2 = _refine_fused(src, src_sq, out, ns, cap=cap,
                                 kq=max(64, 2 * cap), metric=metric, tile=rt)
            _tick(f"large_sym{i + 1}")
            out = _symmetrize_fused(src, src_sq, fwd2, ns, cap=cap,
                                    metric=metric, tile=tile,
                                    precision=precision)

    # the one device->host adjacency crossing of the whole layer
    _tick("large_fetch")
    out_local = np.asarray(out)[:ns]
    _tick("large_fetch", 1.0)
    return np.where(out_local >= 0,
                    member_rows[np.maximum(out_local, 0)],
                    NONE).astype(np.int32)
