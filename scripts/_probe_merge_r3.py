#!/usr/bin/env python
"""Round-3 TPU probe #2: hop-loop merge variants + expand sweep.

Baseline (probe #1): topk merge, pack=True, expand=4 -> 37 hops,
3.36 ms/hop, 8.2k QPS. Questions:
  1. isolated cost of lax.top_k vs approx_min_k on [1024, 228] -> 100
  2. in-loop: merge in {topk, approx} x expand in {4, 8, 16}
     (hops, ms/batch, QPS, recall@10 vs exact)
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

from hnsw_tpu.io.datagen import generate_vectors  # noqa: E402
from hnsw_tpu.types import Corpus  # noqa: E402
from hnsw_tpu.models import build_hnsw_index  # noqa: E402
from hnsw_tpu.models.flat import exact_topk  # noqa: E402
from hnsw_tpu.models.hnsw.search import (  # noqa: E402
    hnsw_search_batch, pack_neighbors, sample_entries,
)

N, DIM, B, K, EF = 31173, 768, 1024, 10, 100


def out(**kw):
    print(json.dumps(kw), flush=True)


def block(x):
    x.block_until_ready()


def timed_loop(fn, reps=8):
    fn()  # compile + warm
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    block(r)
    dt = time.perf_counter() - t0
    if dt < 0.4:
        reps = max(reps * 8, int(reps * 0.8 / max(dt / reps, 1e-9) / 8) * 8)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        block(r)
        dt = time.perf_counter() - t0
    return dt / reps


# ---- isolated selection ops ------------------------------------------------
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (B, 228), jnp.float32)
block(x)

topk_f = jax.jit(lambda a: jax.lax.top_k(-a, EF)[0])
approx_f = jax.jit(lambda a: jax.lax.approx_min_k(a, EF,
                                                  recall_target=0.95)[0])
sortf = jax.jit(lambda a: jnp.sort(a, axis=-1))
out(op="top_k_228_to_100", ms=round(timed_loop(lambda: topk_f(x)) * 1e3, 3))
out(op="approx_min_k_228_to_100",
    ms=round(timed_loop(lambda: approx_f(x)) * 1e3, 3))
out(op="sort_228", ms=round(timed_loop(lambda: sortf(x)) * 1e3, 3))

# ---- in-loop sweep ----------------------------------------------------------
data = generate_vectors(N, DIM, distribution="embedding",
                        num_clusters=64, seed=42)
corpus = Corpus.from_array(data)
block(corpus.vectors)
idx = build_hnsw_index(corpus, M=16)
out(stage="built")

g = idx.graph
q = corpus.pad_queries(data[:B])
vec_lp = corpus.vectors.astype(jnp.bfloat16)
entries, _ = sample_entries(corpus.vectors, corpus.sq_norms,
                            idx._entry_rows(), q, metric=corpus.metric)
block(entries)
nbr_pack, nbr_sq = pack_neighbors(vec_lp, corpus.sq_norms, g.adj0)
block(nbr_sq)
upper = g.adj_upper[:0]

gt_d, gt_i = exact_topk(corpus.vectors, corpus.sq_norms, q,
                        jnp.int32(corpus.n), k=K, metric=corpus.metric)
gt = np.asarray(gt_i)
block(gt_i)


def recall(rows):
    r = np.asarray(rows)
    hits = sum(len(set(r[i]) & set(gt[i])) for i in range(B))
    return hits / (B * K)


for merge in ("topk", "approx"):
    for expand in (4, 8, 16):
        def call(dbg=False):
            return hnsw_search_batch(
                corpus.vectors, corpus.sq_norms, g.adj0, upper, entries, q,
                k=K, ef=EF, expand=expand, metric=corpus.metric,
                precision="default", vectors_lp=vec_lp,
                nbr_pack=nbr_pack, nbr_sq=nbr_sq,
                merge=merge, debug_hops=dbg)

        t0 = time.perf_counter()
        d, r, hops = call(dbg=True)
        block(d)
        t_compile = time.perf_counter() - t0
        rec = recall(r)
        per_batch = timed_loop(lambda: call()[0])
        out(stage="search", merge=merge, expand=expand, hops=int(hops),
            compile_s=round(t_compile, 1),
            per_batch_ms=round(per_batch * 1e3, 2),
            qps=round(B / per_batch), recall_at_10=round(rec, 4))
