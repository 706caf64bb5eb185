#!/usr/bin/env python
"""Round-3 TPU probe #6: bisect the non-scoring ~2.8 ms/hop of the layer-0
loop body. Each component runs inside a 32-iteration fori_loop (chained by
data dependency) so per-dispatch overhead is amortized; scalar-fetch
barrier. All arrays are jit arguments.
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

from hnsw_tpu.io.persist import load_index  # noqa: E402
from hnsw_tpu.models.hnsw.search import _dedupe_row  # noqa: E402
from hnsw_tpu.ops.topk import top_k_ascending  # noqa: E402

B, E, M0, EF = 1024, 4, 32, 100
C = E * M0
ITERS = 32


def out(**kw):
    print(json.dumps(kw), flush=True)


def block(x):
    x.block_until_ready()
    jax.device_get(x.ravel()[:1])


def timed(fn, *args):
    r = fn(*args)
    block(r)
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        r = fn(*args)
    block(r)
    dt = time.perf_counter() - t0
    while dt < 0.5 and reps < 1024:
        reps *= 4
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        block(r)
        dt = time.perf_counter() - t0
    return dt / reps / ITERS


idx = load_index("/tmp/hnsw31k_idx.npz")
adj0 = idx.graph.adj0
n = idx.graph.n
block(adj0)
out(stage="loaded", n=int(n), adj_shape=list(adj0.shape))

key = jax.random.PRNGKey(0)
sel0 = jax.random.randint(key, (B, E), 0, n, jnp.int32)
beam_d0 = jnp.sort(jax.random.uniform(key, (B, EF)), axis=-1)
beam_i0 = jax.random.randint(key, (B, EF), 0, n, jnp.int32)
cand_d0 = jax.random.uniform(key, (B, C))
nb0 = jax.random.randint(key, (B, C), 0, n, jnp.int32)


@jax.jit
def loop_adj_gather(adj0, sel):
    def body(i, carry):
        sel, acc = carry
        nb = jnp.take(adj0, sel, axis=0)            # [B, E, M0]
        acc = acc + nb[:, 0, 0]
        sel = (sel + acc[:, None]) % jnp.int32(30000)
        return sel, acc
    _, acc = jax.lax.fori_loop(0, ITERS, body, (sel, jnp.zeros((B,), jnp.int32)))
    return acc


@jax.jit
def loop_merge(beam_d, beam_i, cand_d, nb):
    def body(i, carry):
        beam_d, beam_i, beam_e = carry
        all_d = jnp.concatenate([beam_d, cand_d + beam_d[:, :1]], axis=-1)
        all_i = jnp.concatenate([beam_i, nb], axis=-1)
        all_e = jnp.concatenate(
            [beam_e, jnp.zeros((B, C), bool)], axis=-1)
        kd, s = top_k_ascending(all_d, EF)
        return (kd, jnp.take_along_axis(all_i, s, axis=-1),
                jnp.take_along_axis(all_e, s, axis=-1))
    r = jax.lax.fori_loop(0, ITERS, body,
                          (beam_d, beam_i, jnp.zeros((B, EF), bool)))
    return r[0]


@jax.jit
def loop_dedupe(nb, beam_i):
    def body(i, carry):
        nb, acc = carry
        valid = _dedupe_row(nb, nb >= 0)
        in_beam = jnp.any(nb[:, :, None] == beam_i[:, None, :], axis=-1)
        valid = valid & ~in_beam
        acc = acc + jnp.sum(valid.astype(jnp.int32), axis=-1)
        nb = nb + acc[:, None] % 7
        return nb, acc
    _, acc = jax.lax.fori_loop(0, ITERS, body,
                               (nb, jnp.zeros((B,), jnp.int32)))
    return acc


@jax.jit
def loop_select(beam_d, beam_i, beam_e):
    e_iota = jnp.arange(E, dtype=jnp.int32)
    def body(i, carry):
        beam_d, beam_e, acc = carry
        elig = (~beam_e) & (beam_i >= 0)
        pos = jnp.cumsum(elig.astype(jnp.int32), axis=-1) - 1
        take = elig & (pos < E)
        onehot = take[:, None, :] & (pos[:, None, :] == e_iota[None, :, None])
        sel_ids = jnp.max(jnp.where(onehot, beam_i[:, None, :], -1), axis=-1)
        beam_e = beam_e | take
        acc = acc + sel_ids[:, 0]
        return beam_d, beam_e, acc
    r = jax.lax.fori_loop(
        0, ITERS, body,
        (beam_d, jnp.zeros((B, EF), bool), jnp.zeros((B,), jnp.int32)))
    return r[2]


for name, fn, args in [
    ("adj_gather", loop_adj_gather, (adj0, sel0)),
    ("beam_merge_topk", loop_merge, (beam_d0, beam_i0, cand_d0, nb0)),
    ("dedupe+inbeam", loop_dedupe, (nb0, beam_i0)),
    ("select_expand", loop_select, (beam_d0, beam_i0, jnp.zeros((B, EF), bool))),
]:
    per = timed(fn, *args)
    out(op=name, per_iter_ms=round(per * 1e3, 3))
