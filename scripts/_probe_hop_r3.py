#!/usr/bin/env python
"""Round-3 TPU probe #3: XLA gather-variant cost for one hop's candidate
scoring at B=1024, E=4, M0=32, D=768 (the bench shape).

The expand sweep (probe #2) showed per-hop cost scales with the candidate
count at ~1 us per gathered neighborhood — DMA-latency-bound, unpipelined.
This probe times XLA-level alternatives; the Pallas ring-DMA kernel
(ops/pallas_hop.py) is the real fix.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N_PAD, DIM, B, E, M0 = 32768, 768, 1024, 4, 32
C = E * M0


def out(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args):
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0
    reps = 16
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps
    return dt, compile_s


key = jax.random.PRNGKey(0)
k1, k2, k3, k5 = jax.random.split(key, 4)
vec_lp = jax.random.normal(k1, (N_PAD, DIM)).astype(jnp.bfloat16)
adj0 = jax.random.randint(k2, (N_PAD, M0), 0, N_PAD, jnp.int32)
nbr_pack = jnp.reshape(jnp.take(vec_lp, adj0.reshape(-1), axis=0),
                       (N_PAD, M0, DIM))
nbr_flat = nbr_pack.reshape(N_PAD, M0 * DIM)
queries = jax.random.normal(k3, (B, DIM), jnp.float32)
sel_rows = jax.random.randint(k5, (B, E), 0, N_PAD, jnp.int32)
nb = jnp.take(adj0, sel_rows, axis=0).reshape(B, C)
jax.block_until_ready(nbr_flat)
out(stage="staged")


@jax.jit
def f_gather3d_score(queries, sel_rows):
    blocks = jnp.take(nbr_pack, sel_rows, axis=0)            # [B, E, M0, D]
    dots = jnp.einsum("bd,bemd->bem", queries.astype(blocks.dtype), blocks,
                      preferred_element_type=jnp.float32)
    return dots.reshape(B, C)


@jax.jit
def f_gather2d_score(queries, sel_rows):
    blocks = jnp.take(nbr_flat, sel_rows, axis=0)            # [B, E, M0*D]
    blocks = blocks.reshape(B, E, M0, DIM)
    dots = jnp.einsum("bd,bemd->bem", queries.astype(blocks.dtype), blocks,
                      preferred_element_type=jnp.float32)
    return dots.reshape(B, C)


@jax.jit
def f_row_gather_score(queries, nb):
    cand = jnp.take(vec_lp, nb, axis=0)                      # [B, C, D]
    return jnp.einsum("bd,bcd->bc", queries.astype(cand.dtype), cand,
                      preferred_element_type=jnp.float32)


for name, fn, args in [
    ("gather3d_score", f_gather3d_score, (queries, sel_rows)),
    ("gather2d_score", f_gather2d_score, (queries, sel_rows)),
    ("row_gather_score", f_row_gather_score, (queries, nb)),
]:
    dt, comp = timed(fn, *args)
    out(op=name, ms=round(dt * 1e3, 3), compile_s=round(comp, 1),
        eff_gbps=round(B * C * DIM * 2 / dt / 1e9, 1))
