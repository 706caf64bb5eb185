"""Batched HNSW beam search.

The reference's query path (ultra_fast.clj:346-374) is a greedy descent:
1 probe per upper layer, then a beam of ef on layer 0 driven by two
PriorityQueues and a HashSet visited set per query (search-layer-ultra,
ultra_fast.clj:151-212) — inherently serial, one scalar distance at a time.

The TPU recast (SURVEY.md §3.2): every query in a batch advances in lockstep
through fixed-shape hops. Each hop expands the E best not-yet-expanded beam
entries, gathers their fixed-degree adjacency rows, scores all E*M0 neighbors
in one fused gather+dot, and merges into the beam with a masked top-ef.

Visited-set accounting exploits a monotonicity invariant: the beam's worst
distance only ever decreases, so a node evicted from the beam can never
re-enter it. Therefore per-slot "expanded" flags carried THROUGH the top-k
merge are a complete replacement for the reference's per-query visited
HashSet (and for a bitmask over node ids — measured 3.4 ms/hop of
take_along_axis traffic at B=1024). Termination matches the serial rule
(best unexpanded candidate worse than the current worst beam member) via a
per-query active flag inside one lax.while_loop.

Scoring inside the loop runs at DEFAULT matmul precision (bf16-class MXU
passes); the final top-k is re-scored at full f32 precision before being
returned, so reported distances are exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hnsw_tpu.ops.distance import BIG, _dist_bc
from hnsw_tpu.ops.sort import bitonic_topk_presorted
from hnsw_tpu.ops.topk import top_k_ascending
from hnsw_tpu.types import Metric


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _beam_merge(beam_d, beam_i, beam_e, cand_d, cand_i, ef: int,
                force: str | None = None):
    """Top-ef merge of [beam ++ candidates] carrying (id, expanded) payload.
    Candidates are fresh (never expanded); the beam is ascending-sorted (the
    invariant every merge re-establishes).

    The default is ONE variadic lax.sort over the concatenation, carrying
    the (id << 1) | expanded bit-packed payload with the keys inside the
    sort network. Measured in situ on the v5e (B=1024, ef=100, C=128,
    scripts/_probe_hop_ablate_r3.py): sort 0.49 ms/hop vs top_k 2.72 —
    the top_k path's cost is NOT the selection but the two lane-axis
    take_along_axis payload gathers after it, which XLA lowers to serial
    per-element dynamic slices inside a loop body. approx_min_k pays the
    same gathers (2.67 ms/hop). -1 ids map to -2/-1 payloads whose
    arithmetic >>1 restores -1.

    Variants behind force=:
    - "topk": lax.top_k + take_along_axis payload gathers (portable).
    - "onehot": lax.top_k + one-hot payload reduction (0.52 ms/hop — the
      fallback shape if a backend lacks fast variadic sort).
    - "approx": jax.lax.approx_min_k — may miss a true top-ef member
      (bucketed min-reduction); a dropped member can re-enter later and be
      re-expanded (its flag was lost), which costs duplicate work but never
      correctness — the in-beam dedupe and the stop rule only need the beam
      to be a subset of the union with ascending order.
    - "bitonic": the ops/sort.py network — ~10x slower in situ (XLA
      materializes every exchange stage); kept for CI coverage and for
      fusion inside future Pallas blocks."""
    use_bitonic = force == "bitonic"
    if use_bitonic:
        pay_beam = (beam_i << 1) | beam_e.astype(jnp.int32)
        pay_cand = cand_i << 1
        kd, kv = bitonic_topk_presorted(beam_d, pay_beam, cand_d, pay_cand,
                                        ef)
        return kd, kv >> 1, (kv & 1) == 1
    all_d = jnp.concatenate([beam_d, cand_d], axis=-1)
    all_i = jnp.concatenate([beam_i, cand_i], axis=-1)
    all_e = jnp.concatenate(
        [beam_e, jnp.zeros(cand_d.shape, bool)], axis=-1)
    if force is None or force == "sort":
        pay = (all_i << 1) | all_e.astype(jnp.int32)
        kd, kp = jax.lax.sort((all_d, pay), num_keys=1)
        kd, kp = kd[..., :ef], kp[..., :ef]
        return kd, kp >> 1, (kp & 1) == 1
    if force == "approx":
        kd, sel = jax.lax.approx_min_k(all_d, ef, recall_target=0.95)
    else:
        kd, sel = top_k_ascending(all_d, ef)
    if force == "onehot":
        # payload extraction as a one-hot reduction instead of lane-axis
        # take_along_axis (which XLA can lower to serial per-element
        # dynamic slices inside a loop body)
        width = all_d.shape[-1]
        oh = sel[:, :, None] == jnp.arange(width, dtype=sel.dtype)[None, None]
        ki = jnp.max(jnp.where(oh, all_i[:, None, :], -(2 ** 31 - 1)),
                     axis=-1)
        ke = jnp.any(oh & all_e[:, None, :], axis=-1)
        return kd, ki, ke
    return (kd, jnp.take_along_axis(all_i, sel, axis=-1),
            jnp.take_along_axis(all_e, sel, axis=-1))


def _score(queries, rows, vectors, v_sq, metric, valid, precision):
    """gather+dot candidate scoring at selectable MXU precision. When the
    vectors array is bf16 (the in-loop shadow copy), the gather moves half
    the HBM bytes — the hop loop's dominant cost."""
    cand = jnp.take(vectors, rows, axis=0)                 # [B, C, D]
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else None
    dots = jnp.einsum("bd,bcd->bc", queries.astype(cand.dtype), cand,
                      preferred_element_type=jnp.float32, precision=prec)
    q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    c_sq = jnp.take(v_sq, rows, axis=0)
    d = _dist_bc(dots, q_sq, c_sq, metric)
    return jnp.where(valid, d, BIG)


def _greedy_descent(queries, cur, cur_d, adj_l, vectors, v_sq, metric,
                    precision):
    """One-probe greedy walk on an upper layer until no neighbor improves —
    the ef=1 upper-layer phase of ultra_fast.clj:358-360, batched."""

    def cond(state):
        _, _, improving = state
        return jnp.any(improving)

    def body(state):
        cur, cur_d, improving = state
        nb = jnp.take(adj_l, cur, axis=0)                      # [B, M]
        valid = (nb >= 0) & improving[:, None]
        d = _score(queries, jnp.maximum(nb, 0), vectors, v_sq, metric,
                   valid, precision)
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


@partial(jax.jit, static_argnames=("k", "ef", "expand", "max_hops", "metric",
                                   "precision", "debug_hops", "merge",
                                   "hop_kernel", "rerank"))
def hnsw_search_batch(
    vectors: jnp.ndarray,     # [N_pad, D]
    v_sq: jnp.ndarray,        # [N_pad]
    adj0: jnp.ndarray,        # [N_pad, M0]
    adj_upper: jnp.ndarray,   # [L, N_pad, M] (L may be 0)
    entries: jnp.ndarray,     # int32 [B] per-query entry point (or scalar),
                              # or [B, P] MULTI-ENTRY seeds (see below)
    queries: jnp.ndarray,     # [B, D]
    *,
    k: int,
    ef: int,
    expand: int = 4,
    max_hops: int = 0,        # 0 => auto bound
    metric: Metric = Metric.COSINE,
    precision: str = "default",
    vectors_lp: jnp.ndarray | None = None,  # bf16 shadow for in-loop scoring
    nbr_pack: jnp.ndarray | None = None,    # [N_pad, M0, D] packed neighbor
                                            # vectors (bf16, pack_neighbors)
                                            # or int8 CODES when nbr_scale
                                            # is given (pack_neighbors_int8)
    nbr_sq: jnp.ndarray | None = None,      # [N_pad, M0] their sq norms
    nbr_scale: jnp.ndarray | None = None,   # [N_pad, M0] per-packed-row int8
                                            # dequant scales; non-None marks
                                            # the pack as int8 codes
    debug_hops: bool = False,               # also return the hop count taken
    merge: str | None = None,               # beam-merge variant ("sort" |
                                            # "topk" | "onehot" | "approx" |
                                            # "bitonic"); None = sort
                                            # (see _beam_merge docstring)
    hop_kernel: str | None = None,          # "pallas": ring-DMA fused
                                            # gather+score (ops/pallas_hop);
                                            # None = XLA gather+einsum
    queries_lp: jnp.ndarray | None = None,  # [B, D_lp] projected queries when
                                            # vectors_lp / nbr_pack are a
                                            # REDUCED-DIM shadow (random
                                            # projection, PCAF-style); the
                                            # hop loop then ranks in D_lp and
                                            # the final re-rank restores
                                            # exact full-dim distances
    v_sq_lp: jnp.ndarray | None = None,     # [N_pad] squared norms of the
                                            # reduced-dim shadow rows
    rerank: int = 0,                        # how many beam entries the exact
                                            # final re-rank considers
                                            # (0 => k; use ~4k with a
                                            # reduced-dim shadow)
):
    """Full hierarchy search. Returns (dists [B, k], rows [B, k]), rows=-1
    for missing. ef is honored exactly (the reference documents ef presets
    but hardcodes ef=max(k,50) — graph.clj:304, SURVEY.md §2.9; we fix that
    per wip/search_config.clj's documented intent).

    When `nbr_pack`/`nbr_sq` are given, the hop loop gathers ONE contiguous
    [M0, D] block per expanded node instead of E*M0 scattered corpus rows.
    TPU row gathers are per-row-overhead bound (~15 ns/row measured — a
    B=1024, C=128 hop pays ~2 ms of pure gather overhead); block packing
    trades 2x degree-duplicated HBM for gathers that run at streaming
    bandwidth. Same idea as DiskANN's neighborhood-contiguous disk layout,
    applied to HBM."""
    b = queries.shape[0]
    ef = max(ef, k)
    e = min(expand, ef)
    entries = jnp.asarray(entries, jnp.int32)
    multi_entry = entries.ndim == 2
    if max_hops <= 0:
        # a serial search expands ~ef candidates; with e per hop that is
        # ef/e hops plus slack for stragglers. Multi-entry searches
        # interleave P disjoint frontiers in one beam and evict more along
        # the way, so convergence takes ~2x the expansions (measured: a
        # 4-seed ef=500 search converges at ~150 hops vs the single-seed
        # bound of 137; the while_loop exits on convergence, so a generous
        # cap costs nothing when queries finish early)
        max_hops = (2 * (ef // e) + 16) if multi_entry else (ef // e + 12)
    loop_vecs = vectors_lp if (vectors_lp is not None
                               and precision != "highest") else vectors
    q_loop = queries_lp if (queries_lp is not None
                            and precision != "highest") else queries
    v_sq_loop = v_sq_lp if (v_sq_lp is not None
                            and precision != "highest") else v_sq

    # ---- seed the beam -------------------------------------------------
    m0 = adj0.shape[1]
    c = e * m0
    if multi_entry:
        # Multi-entry seeding: ONE shared beam per query, seeded at several
        # entry rows (IVF-HNSW probe medoids, partitioned per-shard
        # entries). This replaces the B*P virtual-query fan-out those
        # families used: all probes compete inside a single beam of ef, so
        # an unproductive probe is evicted instead of burning its own full
        # ef hop budget (round 3 measured IVF-HNSW at 3.2k QPS from
        # B*probes virtual queries x ef=300 each; the shared beam searches
        # B queries once). Upper layers are skipped — multi-entry callers
        # search flat disjoint subgraphs (adj_upper empty).
        seeds = entries[:, :ef]                                  # [B, P]
        d_seed = _score(q_loop, jnp.maximum(seeds, 0), loop_vecs, v_sq_loop,
                        metric, seeds >= 0, precision)
        kd, kp = jax.lax.sort((d_seed, seeds), num_keys=1)
        # drop duplicate seeds (e.g. a probe medoid that is also a sampled
        # row): equal ids score equal distances, so they land adjacent.
        # Masked slots sit mid-beam as (-1, BIG) — harmless: expansion
        # rank-compacts over eligible slots and the first merge re-sorts.
        dup = jnp.concatenate(
            [jnp.zeros((b, 1), bool), kp[:, 1:] == kp[:, :-1]], axis=1)
        kd = jnp.where(dup, BIG, kd)
        p_seed = seeds.shape[1]
        beam_d = jnp.full((b, ef), BIG).at[:, :p_seed].set(kd)
        beam_ids = jnp.full((b, ef), -1, jnp.int32).at[:, :p_seed].set(
            jnp.where(kd < BIG, kp, -1))
    else:
        # ---- upper layers: greedy 1-probe descent ----------------------
        cur = jnp.broadcast_to(entries, (b,))
        d0 = _score(q_loop, jnp.maximum(cur[:, None], 0), loop_vecs,
                    v_sq_loop, metric, (cur >= 0)[:, None], precision)[:, 0]
        num_upper = adj_upper.shape[0]
        for l in range(num_upper - 1, -1, -1):
            cur, d0 = _greedy_descent(q_loop, cur, d0, adj_upper[l],
                                      loop_vecs, v_sq_loop, metric, precision)
        beam_d = jnp.full((b, ef), BIG).at[:, 0].set(d0)
        beam_ids = jnp.full((b, ef), -1, jnp.int32).at[:, 0].set(cur)
    beam_exp = jnp.zeros((b, ef), bool)
    e_iota = jnp.arange(e, dtype=jnp.int32)

    def cond(state):
        _, _, _, active, hop = state
        return jnp.any(active) & (hop < max_hops)

    def body(state):
        beam_d, beam_ids, beam_exp, active, hop = state
        elig = (~beam_exp) & (beam_ids >= 0)
        # the beam is kept sorted ascending by the merge, so the FIRST e
        # eligible slots are the e best unexpanded candidates: rank-compact
        # them with a cumsum instead of a per-hop top_k over the beam
        pos = jnp.cumsum(elig.astype(jnp.int32), axis=-1) - 1  # elig rank
        sel_d0 = jnp.min(jnp.where(elig, beam_d, BIG), axis=-1)
        # serial-equivalent stop rule: best unexpanded > worst beam member
        worst = beam_d[:, -1]
        active = active & (sel_d0 < BIG) & (sel_d0 <= worst)
        take = elig & (pos < e) & active[:, None]
        beam_exp = beam_exp | take      # flags travel with the slots
        onehot = take[:, None, :] & (pos[:, None, :] == e_iota[None, :, None])
        sel_ids = jnp.max(jnp.where(onehot, beam_ids[:, None, :], -1),
                          axis=-1)                             # [B, E]

        sel_rows = jnp.maximum(sel_ids, 0)
        nb = jnp.take(adj0, sel_rows, axis=0)                  # [B, E, M0]
        nb = jnp.where((sel_ids >= 0)[:, :, None], nb, -1).reshape(b, c)
        valid = nb >= 0
        valid = _dedupe_row(nb, valid)
        # drop candidates already sitting in the beam (covers every node
        # that is or ever was competitive — evicted nodes cannot return)
        in_beam = jnp.any(nb[:, :, None] == beam_ids[:, None, :], axis=-1)
        valid = valid & ~in_beam

        if nbr_pack is not None and hop_kernel == "pallas":
            # ring-DMA fused gather+score: XLA's gather issues one DMA per
            # [M0, D] neighborhood with no pipelining (~1 us/row measured);
            # the Pallas kernel keeps ~ring*E copies in flight. bf16 packs
            # get csq from the landed block itself (ops/pallas_hop.py);
            # int8 packs (nbr_scale given) return raw dots and take csq +
            # dequant scale from two tiny [B, E, M0] XLA gathers (row
            # gathers this small are per-row-overhead bound at ~15 ns/row
            # — microseconds per hop).
            q_sq = jnp.sum(q_loop.astype(jnp.float32) ** 2, axis=-1,
                           keepdims=True)
            if nbr_scale is not None:
                from hnsw_tpu.ops.pallas_hop import hop_score_int8
                dots = hop_score_int8(nbr_pack, q_loop, sel_rows)
                dots = dots * jnp.take(nbr_scale, sel_rows,
                                       axis=0).reshape(b, c)
                c_sq = jnp.take(nbr_sq, sel_rows, axis=0).reshape(b, c)
            else:
                from hnsw_tpu.ops.pallas_hop import hop_score
                dots, c_sq = hop_score(nbr_pack, q_loop, sel_rows)
            d_nb = jnp.where(valid, _dist_bc(dots, q_sq, c_sq, metric), BIG)
        elif nbr_pack is not None:
            blocks = jnp.take(nbr_pack, sel_rows, axis=0)      # [B, E, M0, D]
            prec = (jax.lax.Precision.HIGHEST if precision == "highest"
                    else None)
            bdt = jnp.bfloat16 if nbr_scale is not None else blocks.dtype
            dots = jnp.einsum(
                "bd,bemd->bem", q_loop.astype(bdt), blocks.astype(bdt),
                preferred_element_type=jnp.float32,
                precision=prec).reshape(b, c)
            if nbr_scale is not None:      # dequantize int8 code dots
                dots = dots * jnp.take(nbr_scale, sel_rows,
                                       axis=0).reshape(b, c)
            q_sq = jnp.sum(q_loop.astype(jnp.float32) ** 2, axis=-1,
                           keepdims=True)
            c_sq = jnp.take(nbr_sq, sel_rows, axis=0).reshape(b, c)
            d_nb = jnp.where(valid, _dist_bc(dots, q_sq, c_sq, metric), BIG)
        else:
            d_nb = _score(q_loop, jnp.maximum(nb, 0), loop_vecs, v_sq_loop,
                          metric, valid, precision)            # [B, C]
        beam_d, beam_ids, beam_exp = _beam_merge(
            beam_d, beam_ids, beam_exp, d_nb, jnp.where(valid, nb, -1), ef,
            force=merge)
        return beam_d, beam_ids, beam_exp, active, hop + 1

    state = (beam_d, beam_ids, beam_exp, jnp.ones((b,), bool), jnp.int32(0))
    beam_d, beam_ids, _, _, hops = jax.lax.while_loop(cond, body, state)

    # exact final re-rank: with a same-dim bf16 shadow the beam order is
    # near-exact and re-scoring the top k suffices; with a REDUCED-DIM
    # shadow the projected order is noisy, so re-rank a wider beam prefix
    # (rerank, typically 4k) at full dimension before taking k
    rw = min(max(rerank, k), ef)
    out_d = beam_d[:, :rw]
    out_i = jnp.where(out_d < BIG, beam_ids[:, :rw], -1)
    if precision != "highest":
        out_d = _score(queries, jnp.maximum(out_i, 0), vectors, v_sq,
                       metric, out_i >= 0, "highest")
        out_d, sel = top_k_ascending(out_d, k)
        out_i = jnp.take_along_axis(out_i, sel, axis=-1)
        out_i = jnp.where(out_d < BIG, out_i, -1)
    else:
        out_d, out_i = out_d[:, :k], out_i[:, :k]
    if debug_hops:
        return out_d, out_i, hops
    return out_d, out_i


def prepare_hop_fast_path(owner, corpus, adj0, *, expand: int, ef: int,
                          pack_bytes_cap: int):
    """Shared wiring for the packed-neighborhood bf16 hop fast path used by
    every family that runs hnsw_search_batch over (sub)graphs — HNSW,
    IVF-HNSW, partitioned. Caches the bf16 corpus shadow and the packed
    neighbor table on `owner` (attributes _vec_lp/_nbr_pack/_nbr_sq) and
    returns the keyword arguments to splat into hnsw_search_batch.

    Policy (identical across families): bf16 in-loop scoring only for
    cosine (the euclidean norm formula cancels catastrophically at bf16 —
    see models/hnsw/__init__.py); the packed table only while its
    degree-duplicated HBM cost fits pack_bytes_cap; the ring-DMA Pallas
    kernel only when the backend is TPU and hop_score_eligible confirms
    both lane alignment and the VMEM budget for the ACTUAL hop width
    min(expand, ef) * M0."""
    precision = ("default" if corpus.metric == Metric.COSINE else "highest")
    if owner._vec_lp is None or owner._vec_lp.shape != corpus.vectors.shape:
        owner._vec_lp = corpus.vectors.astype(jnp.bfloat16)
        owner._nbr_pack = None
        owner._nbr_sq = None
    m0 = adj0.shape[1]
    dim = corpus.vectors.shape[1]
    use_pack = precision != "highest" and (
        adj0.shape[0] * m0 * (dim * 2 + 4) <= pack_bytes_cap)
    if use_pack and owner._nbr_pack is None:
        owner._nbr_pack, owner._nbr_sq = pack_neighbors(
            owner._vec_lp, corpus.sq_norms, adj0)
    from hnsw_tpu.ops.pallas_hop import hop_score_eligible
    hop_kernel = "pallas" if (
        jax.default_backend() == "tpu" and use_pack
        and hop_score_eligible(dim, m0, expand=expand, ef=ef)) else None
    return dict(precision=precision, vectors_lp=owner._vec_lp,
                nbr_pack=owner._nbr_pack if use_pack else None,
                nbr_sq=owner._nbr_sq if use_pack else None,
                hop_kernel=hop_kernel, expand=expand)


@jax.jit
def pack_neighbors(vectors_lp: jnp.ndarray, v_sq: jnp.ndarray,
                   adj0: jnp.ndarray):
    """Materialize the neighborhood-contiguous block table for the hop loop:
    nbr_pack[i, j] = vectors_lp[adj0[i, j]] and nbr_sq[i, j] = v_sq of the
    same row (empty slots -> row 0; the search masks them by adj0 < 0).
    One [N_pad*M0]-row gather at build time buys streaming-bandwidth hops;
    costs M0 * bytes(vectors_lp) of extra HBM (~1.5 GB at 31k x 768 x M0=32
    bf16)."""
    rows = jnp.maximum(adj0, 0)
    return jnp.take(vectors_lp, rows, axis=0), jnp.take(v_sq, rows, axis=0)


@jax.jit
def pack_neighbors_int8(vectors: jnp.ndarray, v_sq: jnp.ndarray,
                        adj0: jnp.ndarray):
    """int8 twin of pack_neighbors: per-row symmetric quantization of the
    (possibly reduced-dim) loop vectors, then the same neighborhood-
    contiguous pack. Halves the bf16 pack's HBM — the capacity limit of the
    graph engine at scale (bf16 PCA-128 at 1M rows = 8.2 GB; int8 = 4.1) —
    and halves the hop loop's DMA bytes. Returns (codes int8 [N_pad, M0, D],
    scales f32 [N_pad, M0], sq norms f32 [N_pad, M0]); sq norms are the
    EXACT shadow norms, not reconstructed from the codes."""
    vf = vectors.astype(jnp.float32)
    vmax = jnp.max(jnp.abs(vf), axis=1, keepdims=True)
    scale = jnp.maximum(vmax / 127.0, 1e-12)
    v8 = jnp.clip(jnp.round(vf / scale), -127, 127).astype(jnp.int8)
    rows = jnp.maximum(adj0, 0)
    return (jnp.take(v8, rows, axis=0),
            jnp.take(scale[:, 0], rows, axis=0),
            jnp.take(v_sq, rows, axis=0))


@partial(jax.jit, static_argnames=("metric", "r"))
def sample_entries_grouped(
    vectors: jnp.ndarray,      # [N_pad, D]
    v_sq: jnp.ndarray,
    sample_rows: jnp.ndarray,  # int32 [P, S] per-group candidate rows (-1 pad)
    queries: jnp.ndarray,      # [B, D]
    *,
    metric: Metric,
    r: int = 1,
):
    """Per-group top-r entry rows: one [B, P*S] GEMM, sort within each
    group's block. The multi-entry analogue of sample_entries for families
    that seed beam slots per disjoint subgraph (partitioned HNSW): a FIXED
    entry per shuffled partition sits in a random topic cluster, and a
    best-first shared beam starves the bad-entry partitions (the path to
    their relevant region ranks below already-found neighbors); r sampled
    per-partition seeds land each partition's probe in the query's
    neighborhood up front (measured at 31k/8 partitions: r=1 capped recall
    at ~0.94 even at ef=500; multi-seeding removes the navigation
    bottleneck). Returns entries [B, P*r] (global rows, -1 padded)."""
    p, s = sample_rows.shape
    flat = sample_rows.reshape(-1)
    sub = jnp.take(vectors, jnp.maximum(flat, 0), axis=0)      # [P*S, D]
    sub_sq = jnp.take(v_sq, jnp.maximum(flat, 0), axis=0)
    dots = jnp.dot(queries, sub.T, preferred_element_type=jnp.float32)
    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    d = _dist_bc(dots, q_sq, sub_sq[None, :], metric)
    b = d.shape[0]
    d = jnp.where((flat >= 0)[None, :], d, BIG).reshape(b, p, s)
    rows_b = jnp.broadcast_to(sample_rows[None], (b, p, s))
    sd, si = jax.lax.sort((d, rows_b), num_keys=1)             # along S
    rr = min(r, s)
    out = jnp.where(sd[:, :, :rr] < BIG, si[:, :, :rr], -1)
    return out.reshape(b, p * rr)


@partial(jax.jit, static_argnames=("metric",))
def sample_entries(
    vectors: jnp.ndarray,      # [N_pad, D]
    v_sq: jnp.ndarray,
    sample_rows: jnp.ndarray,  # int32 [S] candidate entry rows
    queries: jnp.ndarray,      # [B, D]
    *,
    metric: Metric,
):
    """Batched entry selection without hierarchy descent: score each query
    against a fixed row sample in one GEMM and seed the beam at the best.
    The serial upper-layer walk costs ~2 roundtrips per level per batch; at
    TPU batch sizes one [B, S] GEMM finds an equally good layer-0 entry
    (same role as CAGRA-style sampled seeds). Returns (entries [B], d [B])."""
    sub = jnp.take(vectors, sample_rows, axis=0)           # [S, D]
    sub_sq = jnp.take(v_sq, sample_rows, axis=0)
    dots = jnp.dot(queries, sub.T, preferred_element_type=jnp.float32)
    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    d = _dist_bc(dots, q_sq, sub_sq[None, :], metric)
    j = jnp.argmin(d, axis=-1)
    return jnp.take(sample_rows, j), jnp.take_along_axis(d, j[:, None],
                                                         axis=-1)[:, 0]
