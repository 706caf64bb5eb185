"""Pallas ring-DMA neighborhood scoring for the HNSW hop loop.

The hop loop's dominant cost is gathering each expanded node's packed
neighborhood block (nbr_pack[row] = [M0, D] bf16, ~49 KB at 768d/M0=32)
for B*E rows per hop. XLA lowers that gather to one DMA per row with no
pipelining — measured ~1 us/row on-chip (probe #2: per-hop time scales
linearly with E*B at ~46 GB/s effective, 20x under HBM speed-of-light).
The reference hits the same wall differently: its scalar hop loop chases
pointers one neighbor at a time (ultra_fast.clj:151-212).

This kernel processes queries in strips of S=8 (every VMEM row offset is a
provable multiple of the sublane tile — Mosaic rejects per-row dynamic
loads like q_ref[t] outright) and keeps a ring of `ring` strips in flight,
each with S*E outstanding async HBM->VMEM block copies, so DMA latency
overlaps across ~ring*S*E transfers while the MXU scores the strip that
just landed.

Scoring does one [S, D] x [S*C, D]^T strip matmul (S x redundant — each
query only needs its own C columns — but the MXU at these shapes is
weight-load bound, so the redundancy is free) and extracts the block
diagonal of the [S, S, C] reshape. Neighbor squared norms come from a
second ones x (cat*cat) matmul through the same diagonal extraction: that
makes the distances self-consistent with the bf16-rounded corpus and
eliminates a second (tiny-row, latency-bound) norms gather.

Outputs: dots [B, E*M0] f32 and csq [B, E*M0] f32; the caller applies the
metric formula and masking (models/hnsw/search.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STRIP = 8  # queries per strip: the f32 sublane tile (guide: (8, 128))

# Per-core VMEM ceiling for auto-eligibility. Mosaic's scoped-vmem limit is
# 16 MB on v5e; the accounting below (ring scratch + query block + output
# tiles — NO cat*cat temporary: Mosaic fuses the squaring reduction rather
# than materializing the f32 [S*C, D] temporary, verified by a real compile
# at c=256/d=768 in round 5, scripts/_probe_r5b.py force=True) is
# calibrated so c=256 at 768d passes — measured 9.1k QPS vs 5.2k on the
# XLA fallback the old conservative estimate forced partitioned HNSW onto.
VMEM_BUDGET = (15 << 20) + (1 << 19)


def hop_score_eligible(dim: int, m0: int, *, expand: int, ef: int,
                       tb: int = 1024, ring: int = 3) -> bool:
    """Whether hop_score can compile for this shape: lane alignment on the
    ACTUAL hop width c = min(expand, ef) * m0 (not a hardcoded 4*m0 — the
    callers' expand/ef choices change c), and the kernel's resident VMEM
    within budget. At dim >= 1536 the default tb=1024 exceeds the scoped
    limit, so auto-selection falls back to the XLA einsum path instead of
    dying in Mosaic."""
    c = min(expand, max(ef, 1)) * m0
    if dim % 128 != 0 or c % 128 != 0:
        return False
    vmem = (ring * STRIP * c * dim * 2      # packed-block ring scratch (bf16)
            + tb * dim * 4                  # query block (f32)
            + 2 * tb * c * 4)               # dots/csq output tiles (f32)
    return vmem <= VMEM_BUDGET


def hop_score_int8_eligible(dim: int, m0: int, *, expand: int, ef: int,
                            tb: int = 1024, ring: int = 3) -> bool:
    """Eligibility for hop_score_int8 (int8 packed blocks). On top of
    hop_score_eligible's lane alignment, the int8 HBM blocks must be whole
    int8 tiles ((32, 128) — a [M0, D] block copy with M0 % 32 != 0 is not
    provably tile-aligned for Mosaic). VMEM is smaller than the bf16
    kernel's: int8 ring scratch + a bf16 conversion temporary + one output
    (dots only — squared norms ride a separate tiny XLA gather, see
    models/hnsw/search.py)."""
    c = min(expand, max(ef, 1)) * m0
    if dim % 128 != 0 or c % 128 != 0 or m0 % 32 != 0:
        return False
    vmem = (ring * STRIP * c * dim      # packed-block ring scratch (int8)
            + STRIP * c * dim * 2      # bf16 conversion temporary
            + tb * dim * 4             # query block (f32)
            + tb * c * 4)              # dots output tile (f32)
    return vmem <= VMEM_BUDGET - (1 << 20)


def _make_kernel(tb: int, e: int, m0: int, d: int, sq: int, s: int):
    c = e * m0
    sc = s * c

    def kernel(sel_ref, q_ref, hbm_ref, dots_ref, csq_ref, blk, sem):
        g = pl.program_id(0)
        base = g * tb
        nstrips = tb // s

        def dma(t, i, j):
            slot = jax.lax.rem(t, sq)
            # sel is FLAT [B*E] (a 2D SMEM operand is lane-padded 32x,
            # blowing the 1 MB SMEM budget past ~2048 rows)
            row = sel_ref[(base + t * s + i) * e + j]
            return pltpu.make_async_copy(
                hbm_ref.at[row],                           # [M0, D] in HBM
                blk.at[slot, pl.ds((i * e + j) * m0, m0), :],
                sem.at[slot, i, j],
            )

        # warm the ring: `sq` strips x S*E blocks in flight
        for t in range(min(sq, nstrips)):
            for i in range(s):
                for j in range(e):
                    dma(t, i, j).start()

        ii = jax.lax.broadcasted_iota(jnp.int32, (s, s, 1), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (s, s, 1), 1)
        diag = (ii == jj).astype(jnp.float32)              # [S, S, 1]

        def body(t, _):
            slot = jax.lax.rem(t, sq)
            for i in range(s):
                for j in range(e):
                    dma(t, i, j).wait()
            r0 = pl.multiple_of(t * s, s)
            qs = q_ref[pl.ds(r0, s), :].astype(hbm_ref.dtype)   # [S, D]
            cat = blk[slot]                                     # [S*C, D]
            dots_full = jax.lax.dot_general(
                qs, cat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # [S, S*C]
            dots_ref[pl.ds(r0, s), :] = jnp.sum(
                dots_full.reshape(s, s, c) * diag, axis=1)
            # per-row squared norms: square in f32 on the VPU and reduce
            # along lanes. Exact (an earlier bf16 cat*cat ones-matmul added
            # ~0.3% relative error to csq), and the block row layout
            # (i*C + j*M0 + m) makes the flat [S*C] reduction reshape
            # directly to each query's [C] slice — no diagonal extraction.
            catf = cat.astype(jnp.float32)
            csq_ref[pl.ds(r0, s), :] = jnp.sum(catf * catf,
                                               axis=1).reshape(s, c)

            @pl.when(t + sq < nstrips)
            def _():
                for i in range(s):
                    for j in range(e):
                        dma(t + sq, i, j).start()
            return 0

        jax.lax.fori_loop(0, nstrips, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("tb", "ring", "interpret"))
def hop_score(
    nbr_pack: jnp.ndarray,   # [N_pad, M0, D] bf16 packed neighborhoods
    queries: jnp.ndarray,    # [B, D] (cast to nbr_pack dtype in-kernel)
    sel_rows: jnp.ndarray,   # [B, E] int32 node rows (invalid -> clamp 0)
    *,
    tb: int = 1024,
    ring: int = 3,
    interpret: bool = False,
):
    """Fused gather+score of each query's E neighborhoods.
    Returns (dots [B, E*M0] f32, csq [B, E*M0] f32)."""
    n_pad, m0, d = nbr_pack.shape
    b, e = sel_rows.shape
    s = STRIP
    c = e * m0
    # pad the batch to a whole number of strips
    b_pad = -(-b // s) * s
    sel = jnp.maximum(sel_rows, 0)
    q = queries.astype(jnp.float32)
    if b_pad != b:
        sel = jnp.pad(sel, ((0, b_pad - b), (0, 0)))
        q = jnp.pad(q, ((0, b_pad - b), (0, 0)))
    tb = min(tb, b_pad)
    if b_pad % tb != 0:
        tb = next(t for t in range(tb, 0, -s) if b_pad % t == 0 and t % s == 0)
    sq = max(1, min(ring, tb // s))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // tb,),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, sel_ref: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tb, c), lambda i, sel_ref: (i, 0)),
            pl.BlockSpec((tb, c), lambda i, sel_ref: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((sq, s * c, d), nbr_pack.dtype),
            pltpu.SemaphoreType.DMA((sq, s, e)),
        ],
    )
    dots, csq = pl.pallas_call(
        _make_kernel(tb, e, m0, d, sq, s),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, c), jnp.float32),
        ],
        interpret=interpret,
    )(sel.reshape(-1), q, nbr_pack)
    return dots[:b], csq[:b]


# ---------------------------------------------------------------------------
# int8-packed variant: the neighbor-pack table is the HBM-capacity limit of
# the graph engine at scale (bf16 PCA-128 pack at 1M rows = 8.2 GB — over
# half the v5e's 16 GB before the corpus itself). int8 codes halve it to
# 4.1 GB AND halve the hop loop's DMA bytes. The MXU is NOT the bottleneck
# here (per-strip [8, D] x [D, S*C] matmuls are tiny next to the block DMA),
# so the kernel converts the landed int8 codes to bf16 on the VPU and scores
# with the UNQUANTIZED bf16 queries: dots_raw ~ q . round(v/scale), and the
# caller multiplies by the per-packed-row scale — no query quantization, so
# the only added error over the bf16 pack is the codes' ~0.3% rounding.
# Squared norms are NOT recomputed in-kernel (they would need the scale):
# the caller gathers the exact [B, E, M0] norms with one tiny XLA take.
# ---------------------------------------------------------------------------

def _make_kernel_int8(tb: int, e: int, m0: int, d: int, sq: int, s: int):
    c = e * m0
    sc = s * c

    def kernel(sel_ref, q_ref, hbm_ref, dots_ref, blk, sem):
        g = pl.program_id(0)
        base = g * tb
        nstrips = tb // s

        def dma(t, i, j):
            slot = jax.lax.rem(t, sq)
            row = sel_ref[(base + t * s + i) * e + j]
            return pltpu.make_async_copy(
                hbm_ref.at[row],                           # [M0, D] int8
                blk.at[slot, pl.ds((i * e + j) * m0, m0), :],
                sem.at[slot, i, j],
            )

        for t in range(min(sq, nstrips)):
            for i in range(s):
                for j in range(e):
                    dma(t, i, j).start()

        ii = jax.lax.broadcasted_iota(jnp.int32, (s, s, 1), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (s, s, 1), 1)
        diag = (ii == jj).astype(jnp.float32)              # [S, S, 1]

        def body(t, _):
            slot = jax.lax.rem(t, sq)
            for i in range(s):
                for j in range(e):
                    dma(t, i, j).wait()
            r0 = pl.multiple_of(t * s, s)
            qs = q_ref[pl.ds(r0, s), :].astype(jnp.bfloat16)    # [S, D]
            # int8 codes in [-127, 127] are exactly representable in bf16
            cat = blk[slot].astype(jnp.bfloat16)                # [S*C, D]
            dots_full = jax.lax.dot_general(
                qs, cat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # [S, S*C]
            dots_ref[pl.ds(r0, s), :] = jnp.sum(
                dots_full.reshape(s, s, c) * diag, axis=1)

            @pl.when(t + sq < nstrips)
            def _():
                for i in range(s):
                    for j in range(e):
                        dma(t + sq, i, j).start()
            return 0

        jax.lax.fori_loop(0, nstrips, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("tb", "ring", "interpret"))
def hop_score_int8(
    nbr_pack: jnp.ndarray,   # [N_pad, M0, D] int8 packed neighborhood codes
    queries: jnp.ndarray,    # [B, D] f32 (scored as bf16 — NOT quantized)
    sel_rows: jnp.ndarray,   # [B, E] int32 node rows (invalid -> clamp 0)
    *,
    tb: int = 1024,
    ring: int = 3,
    interpret: bool = False,
):
    """Fused gather+score over int8 packed blocks. Returns RAW dots
    [B, E*M0] f32 (~ q . round(v/scale)); the caller multiplies by the
    per-packed-row dequant scale and supplies squared norms separately."""
    n_pad, m0, d = nbr_pack.shape
    b, e = sel_rows.shape
    s = STRIP
    c = e * m0
    b_pad = -(-b // s) * s
    sel = jnp.maximum(sel_rows, 0)
    q = queries.astype(jnp.float32)
    if b_pad != b:
        sel = jnp.pad(sel, ((0, b_pad - b), (0, 0)))
        q = jnp.pad(q, ((0, b_pad - b), (0, 0)))
    tb = min(tb, b_pad)
    if b_pad % tb != 0:
        tb = next(t for t in range(tb, 0, -s) if b_pad % t == 0 and t % s == 0)
    sq = max(1, min(ring, tb // s))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // tb,),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, sel_ref: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tb, c), lambda i, sel_ref: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((sq, s * c, d), nbr_pack.dtype),
            pltpu.SemaphoreType.DMA((sq, s, e)),
        ],
    )
    (dots,) = pl.pallas_call(
        _make_kernel_int8(tb, e, m0, d, sq, s),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, c), jnp.float32),
        ],
        interpret=interpret,
    )(sel.reshape(-1), q, nbr_pack)
    return dots[:b]
