"""Pallas ring-DMA neighborhood scoring for the HNSW hop loop.

The hop loop's dominant cost is gathering each expanded node's packed
neighborhood block (nbr_pack[row] = [M0, D] bf16, ~49 KB at 768d/M0=32)
for B*E rows per hop. XLA lowers that gather to one DMA per row with no
pipelining — measured ~1 us/row on-chip (probe #2: per-hop time scales
linearly with E*B at ~46 GB/s effective, 20x under HBM speed-of-light).
The reference hits the same wall differently: its scalar hop loop chases
pointers one neighbor at a time (ultra_fast.clj:151-212).

This kernel keeps a ring of SQ in-flight queries, each with E outstanding
async copies from HBM into VMEM, so DMA latency overlaps across ~SQ*E
transfers while the MXU scores the block that just landed. Neighbor squared
norms are recomputed from the landed bf16 block (self-dot on the VPU): that
makes the distance the exact cosine/euclidean of the bf16-rounded corpus —
self-consistent with the dots — and saves a second (tiny-row, latency-bound)
gather of a separate norms table.

Outputs: dots [B, E*M0] f32 and csq [B, E*M0] f32; the caller applies the
metric formula and masking (models/hnsw/search.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(tb: int, e: int, m0: int, d: int, sq: int):
    c = e * m0

    def kernel(sel_ref, q_ref, hbm_ref, dots_ref, csq_ref, blk, sem):
        g = pl.program_id(0)
        base = g * tb

        def dma(t, j):
            slot = jax.lax.rem(t, sq)
            row = sel_ref[base + t, j]
            return pltpu.make_async_copy(
                hbm_ref.at[row],                        # [M0, D] in HBM
                blk.at[slot, pl.ds(j * m0, m0), :],     # -> slot's strip
                sem.at[slot, j],
            )

        # warm the ring: SQ queries x E blocks in flight
        for t in range(sq):
            for j in range(e):
                dma(t, j).start()

        def body(t, _):
            slot = jax.lax.rem(t, sq)
            for j in range(e):
                dma(t, j).wait()
            cat = blk[slot]                             # [E*M0, D] bf16
            q = q_ref[pl.ds(t, 1), :]                   # [1, D] bf16
            dots = jax.lax.dot_general(
                q, cat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [1, C]
            csq = jnp.sum(cat.astype(jnp.float32) * cat.astype(jnp.float32),
                          axis=1)[None, :]              # [1, C]
            dots_ref[pl.ds(t, 1), :] = dots
            csq_ref[pl.ds(t, 1), :] = csq

            @pl.when(t + sq < tb)
            def _():
                for j in range(e):
                    dma(t + sq, j).start()
            return 0

        jax.lax.fori_loop(0, tb, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("tb", "ring", "interpret"))
def hop_score(
    nbr_pack: jnp.ndarray,   # [N_pad, M0, D] bf16 packed neighborhoods
    queries: jnp.ndarray,    # [B, D] (cast to nbr_pack dtype)
    sel_rows: jnp.ndarray,   # [B, E] int32 node rows (invalid -> clamp 0)
    *,
    tb: int = 256,
    ring: int = 8,
    interpret: bool = False,
):
    """Fused gather+score of each query's E neighborhoods.
    Returns (dots [B, E*M0] f32, csq [B, E*M0] f32)."""
    n_pad, m0, d = nbr_pack.shape
    b, e = sel_rows.shape
    if b <= max(tb, 1024):
        tb = b          # single grid step; VMEM blocks stay small (<~6 MB)
    else:
        tb = next(t for t in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1)
                  if b % t == 0)
    sq = min(ring, tb)
    c = e * m0
    sel = jnp.maximum(sel_rows, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, sel_ref: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tb, c), lambda i, sel_ref: (i, 0)),
            pl.BlockSpec((tb, c), lambda i, sel_ref: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((sq, c, d), nbr_pack.dtype),
            pltpu.SemaphoreType.DMA((sq, e)),
        ],
    )
    dots, csq = pl.pallas_call(
        _make_kernel(tb, e, m0, d, sq),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
        ],
        interpret=interpret,
    )(sel, queries.astype(nbr_pack.dtype), nbr_pack)
    return dots, csq
