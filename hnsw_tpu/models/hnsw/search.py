"""Batched HNSW beam search.

The reference's query path (ultra_fast.clj:346-374) is a greedy descent:
1 probe per upper layer, then a beam of ef on layer 0 driven by two
PriorityQueues and a HashSet visited set per query (search-layer-ultra,
ultra_fast.clj:151-212) — inherently serial, one scalar distance at a time.

The TPU recast (SURVEY.md §3.2): every query in a batch advances in lockstep
through fixed-shape hops. Each hop expands the E best not-yet-expanded beam
entries, gathers their fixed-degree adjacency rows, scores all E*M0 neighbors
in one fused gather+dot, and merges into the beam with a masked top-ef.
The visited HashSet becomes a per-query bitmask over int node ids
(uint32[B, N/32]); "expanded" bits are monotone, so re-inserting an evicted
but unexpanded node is wasted compute, never a correctness issue. Termination
matches the serial rule (best unexpanded candidate worse than the current
worst beam member => stop) via a per-query active flag inside one
lax.while_loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hnsw_tpu.models.hnsw.graph import set_bits, test_bits, num_words
from hnsw_tpu.ops.distance import BIG, gather_score
from hnsw_tpu.ops.topk import top_k_ascending
from hnsw_tpu.types import Metric


def _greedy_descent(queries, cur, cur_d, adj_l, vectors, v_sq, metric):
    """One-probe greedy walk on an upper layer until no neighbor improves —
    the ef=1 upper-layer phase of ultra_fast.clj:358-360, batched.
    cur/cur_d: [B]."""

    def cond(state):
        _, _, improving = state
        return jnp.any(improving)

    def body(state):
        cur, cur_d, improving = state
        nb = jnp.take(adj_l, cur, axis=0)                      # [B, M]
        valid = (nb >= 0) & improving[:, None]
        d = gather_score(queries, jnp.maximum(nb, 0), vectors, v_sq,
                         metric=metric, valid=valid)           # [B, M]
        j = jnp.argmin(d, axis=-1)
        best_d = jnp.take_along_axis(d, j[:, None], axis=-1)[:, 0]
        best_id = jnp.take_along_axis(nb, j[:, None], axis=-1)[:, 0]
        better = (best_d < cur_d) & improving
        return (
            jnp.where(better, best_id, cur),
            jnp.where(better, best_d, cur_d),
            better,
        )

    b = cur.shape[0]
    state = (cur, cur_d, jnp.ones((b,), bool))
    cur, cur_d, _ = jax.lax.while_loop(cond, body, state)
    return cur, cur_d


def _dedupe_row(ids: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Within-row dedupe: mark later duplicates invalid. ids: [B, C]."""
    eq = ids[:, :, None] == ids[:, None, :]                    # [B, j, i]
    c = ids.shape[-1]
    earlier = jnp.tril(jnp.ones((c, c), dtype=bool), k=-1)     # i < j
    dup = jnp.any(eq & earlier & valid[:, None, :], axis=-1)
    return valid & ~dup


@partial(jax.jit, static_argnames=("k", "ef", "expand", "max_hops", "metric"))
def hnsw_search_batch(
    vectors: jnp.ndarray,     # [N_pad, D]
    v_sq: jnp.ndarray,        # [N_pad]
    adj0: jnp.ndarray,        # [N_pad, M0]
    adj_upper: jnp.ndarray,   # [L, N_pad, M] (L may be 0)
    entries: jnp.ndarray,     # int32 [B] per-query entry point (or scalar)
    queries: jnp.ndarray,     # [B, D]
    *,
    k: int,
    ef: int,
    expand: int = 4,
    max_hops: int = 0,        # 0 => auto bound
    metric: Metric = Metric.COSINE,
):
    """Full hierarchy search. Returns (dists [B, k], rows [B, k]), rows=-1
    for missing. ef is honored exactly (the reference documents ef presets
    but hardcodes ef=max(k,50) — graph.clj:304, SURVEY.md §2.9; we fix that
    per wip/search_config.clj's documented intent)."""
    b = queries.shape[0]
    n_pad = vectors.shape[0]
    ef = max(ef, k)
    e = min(expand, ef)
    if max_hops <= 0:
        max_hops = ef // e + 24

    # ---- upper layers: greedy 1-probe descent --------------------------
    cur = jnp.broadcast_to(jnp.asarray(entries, jnp.int32), (b,))
    d0 = gather_score(queries, jnp.maximum(cur[:, None], 0), vectors, v_sq,
                      metric=metric, valid=(cur >= 0)[:, None])[:, 0]
    num_upper = adj_upper.shape[0]
    for l in range(num_upper - 1, -1, -1):
        cur, d0 = _greedy_descent(queries, cur, d0, adj_upper[l],
                                  vectors, v_sq, metric)

    # ---- layer 0: batched beam -----------------------------------------
    m0 = adj0.shape[1]
    c = e * m0
    beam_d = jnp.full((b, ef), BIG).at[:, 0].set(d0)
    beam_ids = jnp.full((b, ef), -1, jnp.int32).at[:, 0].set(cur)
    expanded = jnp.zeros((b, num_words(n_pad)), jnp.uint32)

    def cond(state):
        _, _, _, active, hop = state
        return jnp.any(active) & (hop < max_hops)

    def body(state):
        beam_d, beam_ids, expanded, active, hop = state
        exp_already = test_bits(expanded, beam_ids)            # [B, ef]
        elig = (~exp_already) & (beam_ids >= 0)
        cd = jnp.where(elig, beam_d, BIG)
        sel_d, sel_pos = top_k_ascending(cd, e)                # [B, E]
        sel_ids = jnp.take_along_axis(beam_ids, sel_pos, axis=-1)
        sel_valid = sel_d < BIG
        # serial-equivalent stop rule: best unexpanded > worst beam member
        worst = beam_d[:, -1]
        active = active & sel_valid[:, 0] & (sel_d[:, 0] <= worst)
        sel_ids = jnp.where(sel_valid & active[:, None], sel_ids, -1)
        expanded = set_bits(expanded, sel_ids)

        nb = jnp.take(adj0, jnp.maximum(sel_ids, 0), axis=0)   # [B, E, M0]
        nb = jnp.where((sel_ids >= 0)[:, :, None], nb, -1).reshape(b, c)
        valid = (nb >= 0) & ~test_bits(expanded, nb)
        valid = _dedupe_row(nb, valid)
        # drop candidates already sitting in the beam
        in_beam = jnp.any(nb[:, :, None] == beam_ids[:, None, :], axis=-1)
        valid = valid & ~in_beam

        d_nb = gather_score(queries, jnp.maximum(nb, 0), vectors, v_sq,
                            metric=metric, valid=valid)        # [B, C]
        all_d = jnp.concatenate([beam_d, d_nb], axis=-1)
        all_i = jnp.concatenate([beam_ids, jnp.where(valid, nb, -1)], axis=-1)
        beam_d, sel = top_k_ascending(all_d, ef)
        beam_ids = jnp.take_along_axis(all_i, sel, axis=-1)
        return beam_d, beam_ids, expanded, active, hop + 1

    state = (beam_d, beam_ids, expanded, jnp.ones((b,), bool), jnp.int32(0))
    beam_d, beam_ids, _, _, _ = jax.lax.while_loop(cond, body, state)

    out_d = beam_d[:, :k]
    out_i = jnp.where(out_d < BIG, beam_ids[:, :k], -1)
    return out_d, out_i
