"""HNSW construction on the MXU.

The reference builds its graph by inserting 31k vectors one at a time —
215 seconds, single-threaded, explicitly documented as "Sequential insertion
for now - parallel version had issues" (ultra_fast.clj:303-330,
wip/parallel_build.clj:199-208). That shape cannot run on a TPU and doesn't
need to: for corpus sizes where HNSW matters at all, the all-pairs distance
matrix is a few MXU GEMM tiles. So the primary builder here computes the
EXACT kNN candidate set per node (tiled GEMM + streaming top-k), applies the
reference's neighbor-selection heuristic (graph.clj:163-201: keep a candidate
iff it is closer to the node than to any already-selected neighbor, then
re-add pruned candidates to fill spare slots) as a vectorized scan, and
symmetrizes with a reverse-edge pass + heuristic re-prune (the analogue of
graph.clj:204-236's bidirectional connect with prune-at-cap). Upper layers
repeat the same recipe on the level-l subset. Levels use the reference's
seeded exponential scheme (graph.clj:94-99).

Result: a graph built from *exact* neighborhoods — strictly better input to
the selection heuristic than the reference's approximate search-based
candidates — in milliseconds-to-seconds instead of minutes.

A wave-based incremental insert (`insert_batch`) covers the append/add! API:
each wave batch-searches the current graph for candidates at every level
(the batched form of ultra_fast.clj:216-275), connects forward edges via the
heuristic, and repairs reverse edges with prune-at-cap.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hnsw_tpu.models.flat import exact_topk
from hnsw_tpu.models.hnsw.graph import HNSWGraph, assign_levels, NONE
from hnsw_tpu.models.hnsw.search import hnsw_search_batch
from hnsw_tpu.ops.distance import BIG, gather_score, distances_from_dots
from hnsw_tpu.ops.topk import top_k_ascending
from hnsw_tpu.types import Corpus, Metric

# Query-tile row count for build passes: bounds the [QT, N] score block.
BUILD_TILE = 1024


class BuildInterrupted(Exception):
    """Raised when a should_continue callback returns False mid-build — the
    analogue of the reference's interruptible build (an atom checked every
    100 inserts throwing InterruptedException; bench.clj:138-184)."""


# ---------------------------------------------------------------------------
# neighbor-selection heuristic (graph.clj:163-201), vectorized
# ---------------------------------------------------------------------------

def _heuristic_impl(cand_ids, cand_d, pair_d, *, cap, keep_pruned=True,
                    return_d=False):
    """Traceable core of heuristic_select. Returns sel_ids [T, cap]
    (-1 padded), plus the selected candidates' distances when return_d.
    Candidate j is selected iff it is closer to the node than to every
    already-selected candidate; pruned candidates refill spare slots in
    ascending order when keep_pruned."""
    t, kk = cand_ids.shape
    valid = cand_ids >= 0

    def step(sel_mask, j):
        dmin = jnp.min(jnp.where(sel_mask, pair_d[:, j, :], BIG), axis=-1)
        count = jnp.sum(sel_mask, axis=-1)
        good = (cand_d[:, j] < dmin) & (count < cap) & valid[:, j]
        return sel_mask.at[:, j].set(good), None

    sel_mask, _ = jax.lax.scan(step, jnp.zeros((t, kk), bool),
                               jnp.arange(kk))

    order = jnp.arange(kk, dtype=jnp.float32)[None, :]
    key = jnp.where(sel_mask, order, order + kk)       # selected first
    if not keep_pruned:
        key = jnp.where(sel_mask, key, 4.0 * kk)
    key = jnp.where(valid, key, 8.0 * kk)              # invalid last
    # variadic sort carrying the ids INSIDE the sort network: top_k +
    # take_along_axis payload gathers lower to serial per-element dynamic
    # slices inside scan/loop bodies on TPU (the same pathology the beam
    # merge hit — search.py _beam_merge)
    key_s, ids_s, d_s = jax.lax.sort((key, cand_ids, cand_d), num_keys=1)
    keep = key_s[:, :cap] < 4.0 * kk
    out = jnp.where(keep, ids_s[:, :cap], -1)
    out_d = jnp.where(keep, d_s[:, :cap], BIG)
    if kk < cap:
        out = jnp.pad(out, ((0, 0), (0, cap - kk)), constant_values=-1)
        out_d = jnp.pad(out_d, ((0, 0), (0, cap - kk)), constant_values=BIG)
    return (out, out_d) if return_d else out


@partial(jax.jit, static_argnames=("cap", "keep_pruned"))
def heuristic_select(cand_ids, cand_d, pair_d, *, cap: int,
                     keep_pruned: bool = True):
    """Jitted wrapper over _heuristic_impl (see there for semantics)."""
    return _heuristic_impl(cand_ids, cand_d, pair_d, cap=cap,
                           keep_pruned=keep_pruned)


def _pairwise_among_impl(vecs, sq, metric: Metric, precision="highest"):
    """Distances among gathered candidates. vecs: [T, K, D], sq: [T, K].
    Returns [T, K, K]."""
    if precision == "bf16":
        dots = jnp.einsum("tkd,tld->tkl", vecs.astype(jnp.bfloat16),
                          vecs.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    else:
        dots = jnp.einsum("tkd,tld->tkl", vecs, vecs,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    if metric == Metric.COSINE:
        denom = jnp.sqrt(jnp.maximum(sq[:, :, None] * sq[:, None, :], 1e-12))
        return 1.0 - dots / denom
    if metric == Metric.EUCLIDEAN:
        return jnp.sqrt(jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2 * dots, 0.0))
    if metric == Metric.DOT:
        return -dots
    raise ValueError(metric)


@partial(jax.jit, static_argnames=("cap", "metric", "keep_pruned"))
def select_from_candidates(
    node_vecs: jnp.ndarray,   # [T, D]
    cand_ids: jnp.ndarray,    # [T, C] int32, -1 invalid, may contain dups
    vectors: jnp.ndarray,     # [N_pad, D] global
    v_sq: jnp.ndarray,        # [N_pad]
    self_ids: jnp.ndarray,    # [T] int32 (exclude from candidates)
    *,
    cap: int,
    metric: Metric,
    keep_pruned: bool = True,
):
    """Full pipeline for one node-tile: dedupe candidates, score them against
    the node, sort ascending, pairwise-score, heuristic-select cap."""
    return _select_impl(node_vecs, cand_ids, vectors, v_sq, self_ids,
                        cap=cap, metric=metric, keep_pruned=keep_pruned)


# ---------------------------------------------------------------------------
# reverse-edge collection (host, vectorized numpy)
# ---------------------------------------------------------------------------

def reverse_candidates(adj: np.ndarray, n: int, rev_cap: int) -> np.ndarray:
    """For forward adjacency [ns, cap], collect up to rev_cap reverse sources
    per destination, in forward-slot order (slot order ~ ascending distance).
    Returns [n, rev_cap] int32, -1 padded."""
    ns, cap = adj.shape
    src = np.repeat(np.arange(ns, dtype=np.int32), cap)
    dst = adj.reshape(-1)
    slot = np.tile(np.arange(cap, dtype=np.int32), ns)
    keep = dst >= 0
    src, dst, slot = src[keep], dst[keep], slot[keep]
    order = np.lexsort((slot, dst))
    src, dst = src[order], dst[order]
    # position within each dst group
    first = np.searchsorted(dst, dst, side="left")
    pos = np.arange(len(dst)) - first
    keep = pos < rev_cap
    rev = np.full((n, rev_cap), NONE, np.int32)
    rev[dst[keep], pos[keep]] = src[keep]
    return rev


# ---------------------------------------------------------------------------
# one-layer build: exact kNN candidates -> heuristic -> symmetrize
# ---------------------------------------------------------------------------

# layers at or below this size build entirely on host (no device compiles)
HOST_LAYER_MAX = 512


def _host_distances(x: np.ndarray, metric: Metric) -> np.ndarray:
    sq = (x * x).sum(axis=1)
    dots = x @ x.T
    if metric == Metric.COSINE:
        denom = np.sqrt(np.maximum(sq[:, None] * sq[None, :], 1e-12))
        return (1.0 - dots / denom).astype(np.float32)
    if metric == Metric.EUCLIDEAN:
        return np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2 * dots, 0.0)
                       ).astype(np.float32)
    return (-dots).astype(np.float32)


def _host_heuristic(cand_ids, cand_d, pair_d, cap):
    """Numpy twin of heuristic_select: vectorized over nodes, K-step scan."""
    t, kk = cand_ids.shape
    valid = cand_ids >= 0
    sel = np.zeros((t, kk), bool)
    for j in range(kk):
        masked = np.where(sel, pair_d[:, j, :], np.inf)
        dmin = masked.min(axis=1)
        good = (cand_d[:, j] < dmin) & (sel.sum(axis=1) < cap) & valid[:, j]
        sel[:, j] = good
    order = np.arange(kk, dtype=np.float32)[None, :]
    key = np.where(sel, order, order + kk)
    key = np.where(valid, key, 8.0 * kk)
    pos = np.argsort(key, axis=1)[:, :cap]
    out = np.take_along_axis(cand_ids, pos, axis=1)
    out_key = np.take_along_axis(key, pos, axis=1)
    out = np.where(out_key < 4.0 * kk, out, NONE).astype(np.int32)
    if kk < cap:
        out = np.pad(out, ((0, 0), (0, cap - kk)), constant_values=NONE)
    return out


def _build_layer_host(x: np.ndarray, *, cap: int, k_cand: int,
                      metric: Metric) -> np.ndarray:
    """Whole-layer build in numpy for small layers: zero device compiles."""
    ns = x.shape[0]
    dist = _host_distances(x, metric)
    np.fill_diagonal(dist, np.inf)
    kq = min(k_cand, ns - 1)
    cand = np.argsort(dist, axis=1, kind="stable")[:, :kq].astype(np.int32)
    cand_d = np.take_along_axis(dist, cand, axis=1)
    pair_d = dist[cand[:, :, None], cand[:, None, :]]
    fwd = _host_heuristic(cand, cand_d, pair_d, cap)

    rev = reverse_candidates(fwd, ns, rev_cap=cap)
    both = np.concatenate([fwd, rev], axis=1)
    # dedupe + drop self, re-sort ascending, re-run heuristic
    out = np.full((ns, cap), NONE, np.int32)
    c2 = both.shape[1]
    rows = np.arange(ns)
    d2 = np.where(both >= 0, dist[rows[:, None], np.maximum(both, 0)], np.inf)
    d2 = np.where(both == rows[:, None], np.inf, d2)
    # mark later duplicates
    for j in range(1, c2):
        dup = (both[:, j][:, None] == both[:, :j]).any(axis=1) & (both[:, j] >= 0)
        d2[dup, j] = np.inf
    pos = np.argsort(d2, axis=1, kind="stable")[:, :c2]
    ids_sorted = np.where(np.take_along_axis(d2, pos, axis=1) < np.inf,
                          np.take_along_axis(both, pos, axis=1), NONE)
    d_sorted = np.take_along_axis(d2, pos, axis=1).astype(np.float32)
    d_sorted[~np.isfinite(d_sorted)] = 1e30
    pair2 = dist[np.maximum(ids_sorted, 0)[:, :, None],
                 np.maximum(ids_sorted, 0)[:, None, :]]
    out = _host_heuristic(ids_sorted.astype(np.int32), d_sorted, pair2, cap)
    return out


def _pow2_at_least(x: int, floor: int) -> int:
    p = floor
    while p < x:
        p *= 2
    return p


def build_layer_dispatch(
    vectors: jnp.ndarray,     # [N_pad, D] global corpus
    member_rows: np.ndarray,  # [ns] global row ids in this layer
    *,
    cap: int,
    k_cand: int,
    metric: Metric,
    tile: int = BUILD_TILE,
    precision: str = "highest",
):
    """ASYNC device-layer build: queue the one-dispatch layer program and
    return (device LOCAL-id adjacency [ns_pad, cap], member_rows) WITHOUT
    fetching. Dispatching every layer before fetching any overlaps the
    per-layer host<->device sync (on a relay-tunneled dev setup each
    synchronous fetch costs ~76 ms + transfer; a 31k hierarchy has ~7
    device layers)."""
    ns = len(member_rows)
    member_rows = np.asarray(member_rows, np.int32)
    ns_pad = _pow2_at_least(ns, 2 * HOST_LAYER_MAX)
    rows_padded = np.zeros(ns_pad, np.int32)
    rows_padded[:ns] = member_rows
    sub = jnp.take(vectors, jnp.asarray(rows_padded), axis=0)   # [ns_pad, D]
    mask = (jnp.arange(ns_pad) < ns)[:, None]
    sub = jnp.where(mask, sub, 0.0)
    kq = min(k_cand + 1, ns)  # +1: self will be dropped
    dev = _layer_fused(sub, ns, cap=cap, kq=kq, metric=metric,
                       tile=min(tile, ns_pad), precision=precision)
    if ns_pad <= 32768:
        # local ids fit int16 (max id = ns_pad-1 = 32767): halves the
        # device->host adjacency transfer, which is ~0.4 s of a warm 31k
        # build on the relay
        dev = dev.astype(jnp.int16)
    return dev, member_rows


def finish_layer(dev, member_rows: np.ndarray) -> np.ndarray:
    """Fetch a build_layer_dispatch result and map LOCAL ids to GLOBAL."""
    ns = len(member_rows)
    out_local = np.asarray(dev).astype(np.int32)[:ns]
    return np.where(out_local >= 0,
                    member_rows[np.maximum(out_local, 0)],
                    NONE).astype(np.int32)


def build_layer(
    vectors: jnp.ndarray,     # [N_pad, D] global corpus
    v_sq: jnp.ndarray,
    member_rows: np.ndarray,  # [ns] global row ids in this layer
    *,
    cap: int,
    k_cand: int,
    metric: Metric,
    tile: int = BUILD_TILE,
    precision: str = "highest",
) -> np.ndarray:
    """Build one layer's adjacency over member_rows. Returns [ns, cap] of
    GLOBAL row ids (-1 padded).

    Shapes are bucketed aggressively (power-of-2 member counts, fixed query
    tiles) so the whole hierarchy compiles a handful of kernel variants; tiny
    layers skip the device entirely."""
    ns = len(member_rows)
    if ns <= 1:
        return np.full((ns, cap), NONE, np.int32)
    member_rows = np.asarray(member_rows, np.int32)

    if ns <= HOST_LAYER_MAX:
        x = np.asarray(jnp.take(vectors, jnp.asarray(member_rows), axis=0))
        out_local = _build_layer_host(x, cap=cap, k_cand=k_cand, metric=metric)
        return np.where(out_local >= 0,
                        member_rows[np.maximum(out_local, 0)],
                        NONE).astype(np.int32)

    # device path: pad member count to a power of two (zero rows, masked by
    # the traced n argument and self/valid checks downstream). The entire
    # layer — tile scan, heuristic, reverse edges, re-prune — is ONE jitted
    # dispatch; the only host transfer is the final adjacency fetch.
    dev, rows = build_layer_dispatch(vectors, member_rows, cap=cap,
                                     k_cand=k_cand, metric=metric, tile=tile,
                                     precision=precision)
    return finish_layer(dev, rows)


def _select_impl(node_vecs, cand_ids, vectors, v_sq, self_ids, *, cap,
                 metric, keep_pruned=True, precision="highest"):
    """Traceable core of select_from_candidates (shared by the jitted
    wrapper and the fused layer builder)."""
    t, c = cand_ids.shape
    valid = (cand_ids >= 0) & (cand_ids != self_ids[:, None])
    eq = cand_ids[:, :, None] == cand_ids[:, None, :]
    earlier = jnp.tril(jnp.ones((c, c), bool), k=-1)
    dup = jnp.any(eq & earlier & valid[:, None, :], axis=-1)
    valid = valid & ~dup

    d = gather_score(node_vecs, jnp.maximum(cand_ids, 0), vectors, v_sq,
                     metric=metric, valid=valid)
    # variadic sort (ids ride the sort network) instead of top_k +
    # take_along_axis — see _heuristic_impl
    d_sorted, ids_sorted = jax.lax.sort((d, cand_ids), num_keys=1)
    ids_sorted = jnp.where(d_sorted < BIG, ids_sorted, -1)
    gat = jnp.take(vectors, jnp.maximum(ids_sorted, 0), axis=0)
    gsq = jnp.take(v_sq, jnp.maximum(ids_sorted, 0), axis=0)
    pair_d = _pairwise_among_impl(gat, gsq, metric, precision)
    return _heuristic_impl(ids_sorted, d_sorted, pair_d, cap=cap,
                           keep_pruned=keep_pruned)


def _select_sorted_impl(cand_ids, cand_d, sub_lp, sub_sq, *, cap, metric,
                        precision="bf16"):
    """Selection for candidates that are ALREADY exactly scored and
    ascending (pass1's top-k output; pass2's carried distances): one
    pairwise gather + the heuristic. Skips _select_impl's re-scoring
    gather_score — at 31k that gather (~2M scattered rows per pass) was
    the single largest cost of the fused layer program."""
    gat = jnp.take(sub_lp, jnp.maximum(cand_ids, 0), axis=0)
    gsq = jnp.take(sub_sq, jnp.maximum(cand_ids, 0), axis=0)
    pair_d = _pairwise_among_impl(gat, gsq, metric, precision)
    return _heuristic_impl(cand_ids, cand_d, pair_d, cap=cap, return_d=True)


def _reverse_device(fwd: jnp.ndarray, fwd_d: jnp.ndarray, rev_cap: int):
    """Device-side reverse-edge collection: the jnp twin of
    reverse_candidates, carrying each edge's (symmetric) distance so the
    re-prune pass needs no re-scoring. fwd: [ns_pad, cap] ->
    (rev [ns_pad, rev_cap], rev_d [ns_pad, rev_cap])."""
    ns_pad, cap = fwd.shape
    e = ns_pad * cap
    dst = fwd.reshape(-1)
    src = jax.lax.broadcasted_iota(jnp.int32, (ns_pad, cap), 0).reshape(-1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (ns_pad, cap), 1).reshape(-1)
    # stable order by (dst, slot); invalid edges sort last
    key = jnp.where(dst >= 0, dst * cap + slot, e)
    order = jnp.argsort(key, stable=True)
    dst_s = jnp.take(dst, order)
    src_s = jnp.take(src, order)
    d_s = jnp.take(fwd_d.reshape(-1), order)
    first = jnp.searchsorted(dst_s, dst_s, side="left")
    pos = jnp.arange(e, dtype=jnp.int32) - first.astype(jnp.int32)
    ok = (dst_s >= 0) & (pos < rev_cap)
    row = jnp.where(ok, dst_s, ns_pad)
    col = jnp.where(ok, pos, rev_cap)
    rev = jnp.full((ns_pad + 1, rev_cap + 1), NONE, jnp.int32)
    rev = rev.at[row, col].set(src_s)
    rev_d = jnp.full((ns_pad + 1, rev_cap + 1), BIG)
    rev_d = rev_d.at[row, col].set(d_s)
    return rev[:ns_pad, :rev_cap], rev_d[:ns_pad, :rev_cap]


@partial(jax.jit, static_argnames=("cap", "kq", "metric", "tile",
                                   "precision"))
def _layer_fused(sub: jnp.ndarray, n, *, cap: int, kq: int, metric: Metric,
                 tile: int, precision: str = "highest"):
    """One-dispatch layer build: forward pass (tile scan: exact scores ->
    top-kq -> heuristic), device reverse edges, re-prune pass.

    precision="bf16" scores candidates with single-pass bf16 MXU GEMMs —
    6x cheaper than the 6-pass f32 path; candidate sets are rank-robust to
    the ~1e-3 error and the search-time re-rank is exact, so graph quality
    is essentially unchanged (the auto policy uses it above 50k rows)."""
    ns_pad, d = sub.shape
    n = jnp.asarray(n, jnp.int32)
    sub_sq = jnp.sum(sub * sub, axis=-1)
    num_tiles = ns_pad // tile
    row_valid = jax.lax.broadcasted_iota(jnp.int32, (1, ns_pad), 1) < n
    sub_lp = sub.astype(jnp.bfloat16) if precision == "bf16" else sub

    def score_tile(q):
        if precision == "bf16":
            dots = jnp.dot(q.astype(jnp.bfloat16), sub_lp.T,
                           preferred_element_type=jnp.float32)
        else:
            dots = jnp.dot(q, sub.T, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        dist = distances_from_dots(dots, q_sq, sub_sq, metric)
        return jnp.where(row_valid, dist, BIG)

    def pass1(_, ti):
        start = ti * tile
        q = jax.lax.dynamic_slice_in_dim(sub, start, tile, 0)
        dist = score_tile(q)
        selfi = start + jnp.arange(tile, dtype=jnp.int32)
        # mask self before top-k: the kq candidates are then all real and
        # ALREADY exactly scored + ascending + unique, so selection needs
        # no re-scoring gather, no dedupe, and no sort (_select_sorted_impl)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile, ns_pad), 1)
        dist = jnp.where(cols == selfi[:, None], BIG, dist)
        d_cand, cand = top_k_ascending(dist, kq)
        # kq may exceed the real member count (stacked multi-partition
        # builds share one static kq): BIG-distance slots are padding rows,
        # not candidates
        cand = jnp.where(d_cand < BIG, cand, -1)
        sel, sel_d = _select_sorted_impl(cand, d_cand, sub_lp, sub_sq,
                                         cap=cap, metric=metric,
                                         precision=precision)
        # padding query rows must not emit edges (they would leak back in
        # as reverse-edge sources)
        live = (selfi < n)[:, None]
        return 0, (jnp.where(live, sel, -1), jnp.where(live, sel_d, BIG))

    _, (fwd, fwd_d) = jax.lax.scan(pass1, 0,
                                   jnp.arange(num_tiles, dtype=jnp.int32))
    fwd = fwd.reshape(ns_pad, cap)
    fwd_d = fwd_d.reshape(ns_pad, cap)
    rev, rev_d = _reverse_device(fwd, fwd_d, rev_cap=cap)

    big_id = jnp.int32(1 << 30)

    def pass2(_, ti):
        # symmetrize: [fwd ++ rev] with carried distances (edge distances
        # are metric-symmetric, so reverse edges inherit the forward score)
        # -> id-sort dedupe -> distance sort -> heuristic re-prune
        start = ti * tile
        cand = jnp.concatenate([
            jax.lax.dynamic_slice_in_dim(fwd, start, tile, 0),
            jax.lax.dynamic_slice_in_dim(rev, start, tile, 0),
        ], axis=1)
        cd = jnp.concatenate([
            jax.lax.dynamic_slice_in_dim(fwd_d, start, tile, 0),
            jax.lax.dynamic_slice_in_dim(rev_d, start, tile, 0),
        ], axis=1)
        selfi = start + jnp.arange(tile, dtype=jnp.int32)
        valid = (cand >= 0) & (cand != selfi[:, None])
        key_id = jnp.where(valid, cand, big_id)
        si, sd = jax.lax.sort((key_id, cd), num_keys=1)
        dup = jnp.concatenate(
            [jnp.zeros((tile, 1), bool), si[:, 1:] == si[:, :-1]], axis=1)
        sd = jnp.where(dup | (si >= big_id), BIG, sd)
        sd2, si2 = jax.lax.sort((sd, si), num_keys=1)
        cand2 = jnp.where(sd2 < BIG, si2, -1)
        sel, _ = _select_sorted_impl(cand2, sd2, sub_lp, sub_sq,
                                     cap=cap, metric=metric,
                                     precision=precision)
        return 0, sel

    _, out = jax.lax.scan(pass2, 0, jnp.arange(num_tiles, dtype=jnp.int32))
    return out.reshape(ns_pad, cap)


@partial(jax.jit, static_argnames=("cap", "kq", "tile", "metric",
                                   "precision"))
def _layers_stacked_fused(vectors, mem_s, n_s, *, cap: int, kq: int,
                          tile: int, metric: Metric, precision: str):
    """vmap of _layer_fused over P stacked member sets — one dispatch builds
    one layer of EVERY set. mem_s: [P, S_pad] GLOBAL row ids (-1 pad);
    n_s: [P] member counts. Returns [P, S_pad, cap] GLOBAL ids (-1 pad).
    The single-device twin of parallel/build._stacked_layer."""

    def one(mem, nn):
        sub = jnp.take(vectors, jnp.maximum(mem, 0), axis=0)
        live = (jnp.arange(sub.shape[0]) < nn)[:, None]
        sub = jnp.where(live, sub, 0.0)
        out = _layer_fused(sub, nn, cap=cap, kq=kq, metric=metric,
                           tile=tile, precision=precision)
        return jnp.where(out >= 0, jnp.take(mem, jnp.maximum(out, 0)), NONE)

    return jax.vmap(one)(mem_s, n_s)


def build_layers_stacked(
    vectors: jnp.ndarray,        # [N_pad, D] global corpus
    members: list,               # list of int32 arrays of GLOBAL row ids
    *,
    cap: int,
    k_cand: int,
    metric: Metric,
    precision: str = "highest",
) -> list:
    """Build one graph layer for MANY disjoint member sets (e.g. IVF-HNSW's
    per-cluster graphs — the reference builds those one ForkJoinPool task
    per cluster, ivf_hnsw.clj:236-251) as ONE stacked device dispatch
    instead of a host python loop of per-cluster programs. Returns a list
    of [len(members[i]), cap] adjacencies in GLOBAL ids (-1 pad). Sets at
    or below HOST_LAYER_MAX build on host (zero device compiles) when ALL
    sets are that small."""
    sizes = [len(m) for m in members]
    mx = max(sizes, default=0)
    if mx <= 1:
        return [np.full((s, cap), NONE, np.int32) for s in sizes]

    if mx <= HOST_LAYER_MAX:
        out = []
        for mem in members:
            mem = np.asarray(mem, np.int32)
            if len(mem) <= 1:
                out.append(np.full((len(mem), cap), NONE, np.int32))
                continue
            x = np.asarray(jnp.take(vectors, jnp.asarray(mem), axis=0))
            loc = _build_layer_host(x, cap=cap,
                                    k_cand=min(k_cand, len(mem) - 1),
                                    metric=metric)
            out.append(np.where(loc >= 0, mem[np.maximum(loc, 0)],
                                NONE).astype(np.int32))
        return out

    p = len(members)
    s_pad = _pow2_at_least(mx, 8)
    mem_s = np.full((p, s_pad), NONE, np.int32)
    n_s = np.zeros(p, np.int32)
    for i, mem in enumerate(members):
        mem_s[i, : len(mem)] = np.asarray(mem, np.int32)
        n_s[i] = len(mem)
    stacked = np.asarray(_layers_stacked_fused(
        vectors, jnp.asarray(mem_s), jnp.asarray(n_s),
        cap=cap, kq=min(k_cand + 1, s_pad), tile=min(BUILD_TILE, s_pad),
        metric=metric, precision=precision))
    return [stacked[i, : sizes[i]] for i in range(p)]


# ---------------------------------------------------------------------------
# full build
# ---------------------------------------------------------------------------

def build_graph(
    corpus: Corpus,
    *,
    m: int = 16,
    m0: Optional[int] = None,
    ef_construction: int = 200,
    ml: Optional[float] = None,
    seed: int = 42,
    k_cand: Optional[int] = None,
    metric: Optional[Metric] = None,
    progress=None,          # callable(stage: str, fraction: float)
    should_continue=None,   # callable() -> bool; False aborts (BuildInterrupted)
    build_precision: str = "auto",  # "auto" | "highest" | "bf16"
    large_probe_clusters: int = 2,  # candidate-pool breadth of the bucketed
                                    # large-N builder (build_large.py): each
                                    # node pools its cell + this many nearest
                                    # cells; raise for better graph quality
                                    # at ~linear build cost (500k recall
                                    # caps at ~0.95 with 2)
    large_refine_rounds: int = 1,   # NN-descent polish rounds after the
                                    # bucketed build (build_large.py
                                    # _refine_fused): probes=4 + 2 rounds
                                    # measured 0.997 edge-recall@16 vs 0.958
                                    # for probes=4 alone
    hierarchy: bool = True,         # False: single-layer graph (levels all
                                    # 0). The default batched search seeds
                                    # via a sampled-entry GEMM and never
                                    # walks the upper layers (HNSWIndex
                                    # entry_mode="sample"), so the
                                    # hierarchy is only needed for
                                    # entry_mode="hierarchy" parity; the
                                    # upper layers are ~half the build time
) -> HNSWGraph:
    """Build the full hierarchy. k_cand is the exact-kNN candidate pool fed
    to the heuristic (the analogue of ef-construction's candidate set,
    graph.clj:70)."""

    def _tick(stage, frac):
        if should_continue is not None and not should_continue():
            raise BuildInterrupted(f"build interrupted at {stage}")
        if progress is not None:
            progress(stage, frac)
    n = corpus.n
    n_pad = corpus.n_pad
    m0 = m0 or 2 * m
    ml = ml if ml is not None else 1.0 / math.log(2.0)
    metric = metric or corpus.metric
    k_cand = k_cand or min(max(2 * m0, 48), 192)
    if build_precision == "auto":
        # single-pass bf16 MXU scoring is 6x cheaper than 6-pass f32 and
        # candidate sets are rank-robust to the ~1e-3 error (validated by
        # test_hnsw.py:test_bf16_build_precision_quality) — use it for
        # cosine at every size. The euclidean norm formula cancels
        # catastrophically at bf16, so it keeps exact f32 until the N^2
        # cost forces the trade above ~50k rows.
        if metric == Metric.COSINE or n > 50000:
            build_precision = "bf16"
        else:
            build_precision = "highest"

    levels_np = assign_levels(n, ml, seed,
                              max_cap=max(int(math.log2(max(n, 2))), 1))
    if not hierarchy:
        levels_np = np.zeros_like(levels_np)
    max_level = int(levels_np.max()) if n else 0

    levels = np.full((n_pad,), NONE, np.int32)
    levels[:n] = levels_np

    from hnsw_tpu.models.hnsw.build_large import (
        LARGE_N, build_layer_clustered,
    )

    adj0 = np.full((n_pad, m0), NONE, np.int32)
    adj_upper = np.full((max_level, n_pad, m), NONE, np.int32)

    # Phase 1 — DISPATCH: queue every device-layer program without fetching
    # (TPU execution is in-order, so the fetches in phase 2 overlap all
    # queued compute; a fetch-per-layer loop pays ~7 serialized relay
    # roundtrips on a 31k hierarchy). Layers above LARGE_N take the
    # bucketed builder synchronously (it is internally multi-dispatch).
    pending = []     # (level, dev, member_rows) — level 0 targets adj0
    _tick("layer0", 0.0)
    if n > 1:
        members0 = np.arange(n, dtype=np.int32)
        if n > LARGE_N:
            adj0[:n] = build_layer_clustered(
                corpus.vectors, corpus.sq_norms, members0,
                cap=m0, k_cand=k_cand, metric=metric, seed=seed,
                n_probe_clusters=large_probe_clusters,
                refine_rounds=large_refine_rounds,
                precision=build_precision, progress=progress)
        else:
            pending.append((0, *build_layer_dispatch(
                corpus.vectors, members0, cap=m0, k_cand=k_cand,
                metric=metric, precision=build_precision)))
    _tick("layer0", 1.0)

    host_layers = []
    for l in range(1, max_level + 1):
        _tick(f"layer{l}", l / max(max_level, 1))
        members = np.nonzero(levels_np >= l)[0].astype(np.int32)
        if len(members) <= 1:
            continue
        if len(members) > LARGE_N:
            adj_upper[l - 1, members] = build_layer_clustered(
                corpus.vectors, corpus.sq_norms, members,
                cap=m, k_cand=min(k_cand, 4 * m), metric=metric, seed=seed,
                n_probe_clusters=large_probe_clusters,
                refine_rounds=large_refine_rounds,
                precision=build_precision, progress=progress)
        elif len(members) > HOST_LAYER_MAX:
            pending.append((l, *build_layer_dispatch(
                corpus.vectors, members, cap=m,
                k_cand=min(k_cand, 4 * m), metric=metric,
                precision=build_precision)))
        else:
            host_layers.append((l, members))

    # Phase 2 — host small layers (their one vector fetch drains the device
    # queue while numpy works), then fetch the dispatched adjacencies
    host_x = None
    host_pos = None
    for l, members in host_layers:
        if host_x is None:
            host_x = np.asarray(
                jnp.take(corpus.vectors, jnp.asarray(members), axis=0))
            host_pos = {int(r): i for i, r in enumerate(members)}
            x = host_x
        else:
            x = host_x[[host_pos[int(r)] for r in members]]
        out_local = _build_layer_host(x, cap=m, k_cand=min(k_cand, 4 * m),
                                      metric=metric)
        adj_upper[l - 1, members] = np.where(
            out_local >= 0, members[np.maximum(out_local, 0)],
            NONE).astype(np.int32)

    _tick("fetch", 0.0)
    for l, dev, rows in pending:
        out = finish_layer(dev, rows)
        if l == 0:
            adj0[:n] = out
        else:
            adj_upper[l - 1, rows] = out
    _tick("fetch", 1.0)

    if n:
        top_nodes = np.nonzero(levels_np == max_level)[0]
        entry = int(top_nodes[0])
    else:
        entry = NONE

    # Connectivity repair: exact-kNN construction leaves clustered corpora
    # as one high-quality graph PER cluster with no inter-cluster edges
    # (measured: 964/31,173 rows BFS-reachable on a 64-cluster corpus,
    # capping recall at ~0.97). The reference's sequential insert never hits
    # this (early inserts wire across the whole corpus); a batch builder
    # must bridge explicitly. See repair.py.
    n_bridges = 0
    if n > 1:
        _tick("repair", 0.0)
        from hnsw_tpu.models.hnsw.repair import bridge_components
        adj0[:n], nb = bridge_components(
            corpus.vectors, corpus.sq_norms, adj0[:n],
            np.arange(n, dtype=np.int32), metric=metric, seed=seed)
        n_bridges += nb
        for l in range(1, max_level + 1):
            members = np.nonzero(levels_np >= l)[0].astype(np.int32)
            if len(members) <= 1:
                continue
            adj_upper[l - 1, members], nb = bridge_components(
                corpus.vectors, corpus.sq_norms, adj_upper[l - 1, members],
                members, metric=metric, seed=seed)
            n_bridges += nb
        _tick("repair", 1.0)

    return HNSWGraph(
        levels=jnp.asarray(levels),
        adj0=jnp.asarray(adj0),
        adj_upper=jnp.asarray(adj_upper),
        entry=entry,
        max_level=max_level,
        m=m, m0=m0,
        ef_construction=ef_construction,
        n=n,
        n_bridges=n_bridges,
    )


# ---------------------------------------------------------------------------
# incremental wave insert (the batched form of ultra_fast.clj:216-275)
# ---------------------------------------------------------------------------

def insert_wave(
    graph: HNSWGraph,
    corpus: Corpus,
    new_rows: np.ndarray,      # [W] global rows already packed into corpus
    new_levels: np.ndarray,    # [W]
) -> HNSWGraph:
    """Connect a wave of already-packed new rows into an existing graph.

    Per level l (top-down like the reference's insert): batch-search the
    current graph for ef_construction candidates among level-l members, add
    intra-wave candidates (wave x wave GEMM — nodes in one wave DO see each
    other, unlike naive parallel insert), heuristic-select, write forward
    edges, then repair reverse edges with prune-at-cap (the batched
    prune-connections analogue of ultra_fast.clj:279-299, but using the
    selection heuristic for quality like graph.clj:204-236)."""
    w = len(new_rows)
    if w == 0:
        return graph
    n_pad = corpus.n_pad
    vectors, v_sq = corpus.vectors, corpus.sq_norms
    metric = corpus.metric

    # explicit copies: np.asarray over a jax array yields a READ-ONLY view
    # when no dtype/shape conversion happens, and we mutate these in place
    levels = np.array(graph.levels, dtype=np.int32)
    if levels.shape[0] != n_pad:
        grown = np.full((n_pad,), NONE, np.int32)
        grown[: levels.shape[0]] = levels
        levels = grown
    levels[new_rows] = new_levels
    new_max = int(max(graph.max_level, new_levels.max() if w else 0))

    adj0 = np.array(graph.adj0, dtype=np.int32)
    adj_upper = np.array(graph.adj_upper, dtype=np.int32)
    if adj0.shape[0] != n_pad or adj_upper.shape[0] < new_max:
        a0 = np.full((n_pad, graph.m0), NONE, np.int32)
        a0[: adj0.shape[0]] = adj0
        adj0 = a0
        au = np.full((new_max, n_pad, graph.m), NONE, np.int32)
        if adj_upper.size:
            au[: adj_upper.shape[0], : adj_upper.shape[1]] = adj_upper
        adj_upper = au

    # pad the wave to a power-of-two bucket so repeated adds of varying
    # sizes reuse compiled kernels (pad rows carry id -1 / level -1 and are
    # excluded from every write by the at_level mask)
    wp = _pow2_at_least(max(w, 1), 8)
    rows_pad = np.full(wp, NONE, np.int32)
    rows_pad[:w] = new_rows
    levels_pad = np.full(wp, NONE, np.int32)
    levels_pad[:w] = new_levels

    q = jnp.take(vectors, jnp.asarray(np.maximum(rows_pad, 0)), axis=0)
    ef_c = graph.ef_construction

    # candidate pool per level via batched search on the current graph
    for l in range(new_max, -1, -1):
        at_level = levels_pad >= l
        if not at_level.any():
            continue
        cap = graph.m0 if l == 0 else graph.m
        adj_l = jnp.asarray(adj0 if l == 0 else adj_upper[l - 1])
        cands = []
        if graph.n > 0 and graph.entry >= 0:
            # search existing graph restricted to this layer: use the full
            # hierarchy down to layer l by searching with the layer-l
            # adjacency as "layer 0" and upper layers above it
            upper = jnp.asarray(adj_upper[l:]) if l < new_max else \
                jnp.zeros((0, n_pad, graph.m), jnp.int32)
            # euclidean's norm formula cancels catastrophically at bf16-class
            # matmul precision — same auto policy as HNSWIndex.search_batch
            prec = "default" if metric == Metric.COSINE else "highest"
            d_c, i_c = hnsw_search_batch(
                vectors, v_sq, adj_l, upper,
                jnp.full((wp,), graph.entry, jnp.int32), q,
                k=ef_c, ef=ef_c, metric=metric, precision=prec)
            cands.append(np.asarray(i_c))
        # intra-wave candidates at this level
        wave_members = np.nonzero(at_level)[0]
        if len(wave_members) > 1:
            wrows = rows_pad[wave_members]
            wq = _pow2_at_least(len(wrows), 8)
            wrows_pad = np.zeros(wq, np.int32)
            wrows_pad[: len(wrows)] = wrows
            sub = jnp.take(vectors, jnp.asarray(wrows_pad), axis=0)
            mask = (jnp.arange(wq) < len(wrows))[:, None]
            sub = jnp.where(mask, sub, 0.0)
            sub_sq = jnp.sum(sub * sub, axis=-1)
            kq = min(cap + 1, wq)
            _, loc = exact_topk(sub, sub_sq, q, k=kq, n=len(wrows),
                                metric=metric)
            loc = np.asarray(loc)
            cands.append(np.where(loc >= 0,
                                  wrows_pad[np.maximum(loc, 0)], NONE))
        if not cands:
            continue
        cand = np.concatenate(cands, axis=1)
        sel = select_from_candidates(
            q, jnp.asarray(cand), vectors, v_sq, jnp.asarray(rows_pad),
            cap=cap, metric=metric)
        sel = np.asarray(sel)
        target = adj0 if l == 0 else adj_upper[l - 1]
        target[rows_pad[at_level]] = sel[at_level]

        # reverse repair: every selected neighbor gains the new node as a
        # candidate; re-prune affected nodes at cap
        pairs_dst = sel[at_level].reshape(-1)
        pairs_src = np.repeat(rows_pad[at_level], cap)
        keep = pairs_dst >= 0
        pairs_dst, pairs_src = pairs_dst[keep], pairs_src[keep]
        if len(pairs_dst):
            extra_cap = 8
            order = np.lexsort((np.arange(len(pairs_dst)), pairs_dst))
            ds, ss = pairs_dst[order], pairs_src[order]
            first = np.searchsorted(ds, ds, side="left")
            pos = np.arange(len(ds)) - first
            keep2 = pos < extra_cap
            affected = np.unique(ds)
            na = len(affected)
            ap = _pow2_at_least(na, 8)
            aff_pad = np.full(ap, NONE, np.int32)
            aff_pad[:na] = affected
            extra = np.full((ap, extra_cap), NONE, np.int32)
            rowi = np.searchsorted(affected, ds[keep2])
            extra[rowi, pos[keep2]] = ss[keep2]
            cur = np.full((ap, cap), NONE, np.int32)
            cur[:na] = target[affected]
            cand2 = np.concatenate([cur, extra], axis=1)
            node_vecs = jnp.take(vectors,
                                 jnp.asarray(np.maximum(aff_pad, 0)), axis=0)
            sel2 = select_from_candidates(
                node_vecs, jnp.asarray(cand2), vectors, v_sq,
                jnp.asarray(aff_pad), cap=cap, metric=metric)
            target[affected] = np.asarray(sel2)[:na]

    # entry point update (reference keeps highest-level node as entry,
    # ultra_fast.clj:271-273)
    entry = graph.entry
    if new_max > graph.max_level or entry < 0:
        top = new_rows[new_levels.argmax()] if w else entry
        entry = int(top) if (graph.entry < 0 or new_max > graph.max_level) else entry

    return HNSWGraph(
        levels=jnp.asarray(levels),
        adj0=jnp.asarray(adj0),
        adj_upper=jnp.asarray(adj_upper),
        entry=int(entry),
        max_level=new_max,
        m=graph.m, m0=graph.m0,
        ef_construction=graph.ef_construction,
        n=int(graph.n + w),
        n_bridges=graph.n_bridges,
    )
