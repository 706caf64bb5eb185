#!/usr/bin/env python
"""Round-3 TPU probe #3: per-component cost attribution for one hop of the
HNSW beam loop at B=1024, ef=100, expand=4, M0=32, D=768 (the bench shape).

Isolated top_k [1024,228]->100 measures ~0.03 ms (probe #2), so the 3.36
ms/hop cannot be the merge. This probe times each hop component as its own
pipelined jit program on synthetic-but-realistically-shaped state.
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

N_PAD, DIM, B, EF, E, M0 = 32768, 768, 1024, 100, 4, 32
C = E * M0


def out(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    reps = 32
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps
    if dt < 0.002:
        reps = 256
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / reps
    return dt


key = jax.random.PRNGKey(0)
k1, k2, k3, k4, k5 = jax.random.split(key, 5)
vec_lp = jax.random.normal(k1, (N_PAD, DIM), jnp.bfloat16)
v_sq = jnp.sum(vec_lp.astype(jnp.float32) ** 2, axis=-1)
adj0 = jax.random.randint(k2, (N_PAD, M0), 0, N_PAD, jnp.int32)
nbr_pack = jnp.reshape(jnp.take(vec_lp, adj0.reshape(-1), axis=0),
                       (N_PAD, M0, DIM))
nbr_sq = jnp.take(v_sq, adj0.reshape(-1), axis=0).reshape(N_PAD, M0)
queries = jax.random.normal(k3, (B, DIM), jnp.float32)
beam_d = jnp.sort(jax.random.uniform(k4, (B, EF), jnp.float32), axis=-1)
beam_ids = jax.random.randint(k5, (B, EF), 0, N_PAD, jnp.int32)
beam_exp = jnp.zeros((B, EF), bool)
sel_rows = beam_ids[:, :E]
nb = jnp.take(adj0, sel_rows, axis=0).reshape(B, C)
cand_d = jax.random.uniform(k4, (B, C), jnp.float32)
jax.block_until_ready(nbr_pack)
out(stage="staged")


@jax.jit
def f_gather_only(sel_rows):
    blocks = jnp.take(nbr_pack, sel_rows, axis=0)           # [B, E, M0, D]
    return jnp.sum(blocks.astype(jnp.float32), axis=(1, 2, 3))


@jax.jit
def f_gather_score(queries, sel_rows):
    blocks = jnp.take(nbr_pack, sel_rows, axis=0)
    dots = jnp.einsum("bd,bemd->bem", queries.astype(blocks.dtype), blocks,
                      preferred_element_type=jnp.float32)
    return dots.reshape(B, C)


@jax.jit
def f_row_gather_score(queries, nb):
    cand = jnp.take(vec_lp, nb, axis=0)                      # [B, C, D]
    return jnp.einsum("bd,bcd->bc", queries.astype(cand.dtype), cand,
                      preferred_element_type=jnp.float32)


@jax.jit
def f_dedupe(nb):
    eq = nb[:, :, None] == nb[:, None, :]
    earlier = jnp.tril(jnp.ones((C, C), dtype=bool), k=-1)
    return jnp.any(eq & earlier, axis=-1)


@jax.jit
def f_in_beam(nb, beam_ids):
    return jnp.any(nb[:, :, None] == beam_ids[:, None, :], axis=-1)


@jax.jit
def f_merge(beam_d, beam_ids, beam_exp, cand_d, nb):
    all_d = jnp.concatenate([beam_d, cand_d], axis=-1)
    all_i = jnp.concatenate([beam_ids, nb], axis=-1)
    all_e = jnp.concatenate([beam_exp, jnp.zeros((B, C), bool)], axis=-1)
    neg, sel = jax.lax.top_k(-all_d, EF)
    return (-neg, jnp.take_along_axis(all_i, sel, axis=-1),
            jnp.take_along_axis(all_e, sel, axis=-1))


@jax.jit
def f_beam_select(beam_d, beam_ids, beam_exp):
    elig = (~beam_exp) & (beam_ids >= 0)
    pos = jnp.cumsum(elig.astype(jnp.int32), axis=-1) - 1
    e_iota = jnp.arange(E, dtype=jnp.int32)
    take = elig & (pos < E)
    onehot = take[:, None, :] & (pos[:, None, :] == e_iota[None, :, None])
    return jnp.max(jnp.where(onehot, beam_ids[:, None, :], -1), axis=-1)


for name, fn, args in [
    ("gather_only_bem", f_gather_only, (sel_rows,)),
    ("gather_score_pack", f_gather_score, (queries, sel_rows)),
    ("row_gather_score", f_row_gather_score, (queries, nb)),
    ("dedupe_CxC", f_dedupe, (nb,)),
    ("in_beam_CxEF", f_in_beam, (nb, beam_ids)),
    ("merge_topk", f_merge, (beam_d, beam_ids, beam_exp, cand_d, nb)),
    ("beam_select", f_beam_select, (beam_d, beam_ids, beam_exp)),
]:
    ms = timed(fn, *args) * 1e3
    out(op=name, ms=round(ms, 3))
