#!/usr/bin/env python
"""Round-3 TPU probe #7: in-situ ablation of the layer-0 while_loop.

Components measured in isolated fori_loops cost ~0.5 ms/hop total
(adj 0.012 + merge 0.035 + dedupe 0.118 + pallas score 0.33) yet the real
search runs 3.15 ms/hop. This probe re-times the REAL loop structure with
pieces knocked out to find where the in-situ cost hides: fixed trip count
(fori semantics via always-true cond), scoring ablated, dedupe ablated,
merge ablated.
"""

import faulthandler
import json
import os
import sys
import time

faulthandler.dump_traceback_later(120, repeat=True, file=sys.stderr)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from functools import partial  # noqa: E402

from hnsw_tpu.io.persist import load_index  # noqa: E402
from hnsw_tpu.io.datagen import generate_vectors  # noqa: E402
from hnsw_tpu.models.hnsw.search import (  # noqa: E402
    _beam_merge, _dedupe_row, sample_entries, pack_neighbors,
)
from hnsw_tpu.ops.distance import BIG, _dist_bc  # noqa: E402
from hnsw_tpu.types import Metric  # noqa: E402

N, DIM, B, K, EF, E = 31173, 768, 1024, 10, 100, 4
HOPS = 29


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
    return dt / reps


data = generate_vectors(N, DIM, distribution="embedding",
                        num_clusters=64, seed=42)
idx = load_index("/tmp/hnsw31k_idx.npz")
corpus = idx.corpus
g = idx.graph
q = corpus.pad_queries(data[:B])
vec_lp = corpus.vectors.astype(jnp.bfloat16)
entries, _ = sample_entries(corpus.vectors, corpus.sq_norms,
                            idx._entry_rows(), q, metric=corpus.metric)
block(entries)
nbr_pack, nbr_sq = pack_neighbors(vec_lp, corpus.sq_norms, g.adj0)
block(nbr_sq)
out(stage="ready")

M0 = g.adj0.shape[1]
C = E * M0


@partial(jax.jit, static_argnames=("score", "dedupe", "merge_on", "use_while",
                                   "merge_force"))
def loop(adj0, nbr_pack, entries, queries, d0, *, score="pallas",
         dedupe=True, merge_on=True, use_while=True, merge_force=None):
    b = queries.shape[0]
    beam_d = jnp.full((b, EF), BIG).at[:, 0].set(d0)
    beam_ids = jnp.full((b, EF), -1, jnp.int32).at[:, 0].set(entries)
    beam_exp = jnp.zeros((b, EF), bool)
    e_iota = jnp.arange(E, dtype=jnp.int32)
    q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1, keepdims=True)

    def body_core(state):
        beam_d, beam_ids, beam_exp, active, hop = state
        elig = (~beam_exp) & (beam_ids >= 0)
        pos = jnp.cumsum(elig.astype(jnp.int32), axis=-1) - 1
        sel_d0 = jnp.min(jnp.where(elig, beam_d, BIG), axis=-1)
        worst = beam_d[:, -1]
        active = active & (sel_d0 < BIG) & (sel_d0 <= worst)
        take = elig & (pos < E) & active[:, None]
        beam_exp = beam_exp | take
        onehot = take[:, None, :] & (pos[:, None, :] == e_iota[None, :, None])
        sel_ids = jnp.max(jnp.where(onehot, beam_ids[:, None, :], -1),
                          axis=-1)
        sel_rows = jnp.maximum(sel_ids, 0)
        nb = jnp.take(adj0, sel_rows, axis=0)
        nb = jnp.where((sel_ids >= 0)[:, :, None], nb, -1).reshape(b, C)
        valid = nb >= 0
        if dedupe:
            valid = _dedupe_row(nb, valid)
            in_beam = jnp.any(nb[:, :, None] == beam_ids[:, None, :], axis=-1)
            valid = valid & ~in_beam
        if score == "pallas":
            from hnsw_tpu.ops.pallas_hop import hop_score
            dots, c_sq = hop_score(nbr_pack, queries, sel_rows)
            d_nb = jnp.where(valid, _dist_bc(dots, q_sq, c_sq, Metric.COSINE),
                             BIG)
        elif score == "const":
            d_nb = jnp.where(
                valid,
                (jnp.astype(nb % 97, jnp.float32) * 0.01
                 + hop.astype(jnp.float32) * 1e-4), BIG)
        if merge_on:
            beam_d, beam_ids, beam_exp = _beam_merge(
                beam_d, beam_ids, beam_exp, d_nb, jnp.where(valid, nb, -1),
                EF, force=merge_force)
        else:
            beam_d = beam_d + jnp.sum(d_nb * 1e-12, axis=-1, keepdims=True)
        return beam_d, beam_ids, beam_exp, active, hop + 1

    state = (beam_d, beam_ids, beam_exp, jnp.ones((b,), bool), jnp.int32(0))
    if use_while:
        def cond(state):
            return state[4] < HOPS
        state = jax.lax.while_loop(cond, body_core, state)
    else:
        state = jax.lax.fori_loop(
            0, HOPS, lambda i, s: body_core(s), state)
    return state[0]


d0 = jnp.zeros((B,), jnp.float32) + 0.5
VARIANTS = [
    ("full_while", dict()),
    ("full_fori", dict(use_while=False)),
    ("no_score", dict(score="const")),
    ("no_dedupe", dict(dedupe=False)),
    ("no_merge", dict(merge_on=False)),
    ("score_only", dict(dedupe=False, merge_on=False)),
]
if os.environ.get("MERGE_VARIANTS"):
    VARIANTS = [
        ("merge_topk", dict()),
        ("merge_sort", dict(merge_force="sort")),
        ("merge_onehot", dict(merge_force="onehot")),
        ("merge_approx", dict(merge_force="approx")),
    ]
for name, kw in VARIANTS:
    t0 = time.perf_counter()
    per = timed(lambda: loop(g.adj0, nbr_pack, entries, q, d0, **kw))
    out(variant=name, per_batch_ms=round(per * 1e3, 2),
        per_hop_ms=round(per * 1e3 / HOPS, 3),
        compile_s=round(time.perf_counter() - t0, 1))
