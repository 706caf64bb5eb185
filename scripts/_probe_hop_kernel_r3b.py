#!/usr/bin/env python
"""Round-3 TPU probe #5: the strip/ring Pallas hop kernel vs the XLA packed
gather, measured as the FULL production search program with TRUE barriers
(value fetch — block_until_ready alone returns early on the relay) and all
large arrays passed as jit ARGUMENTS (closing over them bakes multi-GB HLO
literals that wedge the remote compiler — the round-2 failure mode).
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
from hnsw_tpu.models.flat import exact_topk  # noqa: E402
from hnsw_tpu.models.hnsw.search import (  # noqa: E402
    hnsw_search_batch, pack_neighbors, sample_entries,
)

N, DIM, B, K = 31173, 768, 1024, 10


def out(**kw):
    print(json.dumps(kw), flush=True)


def block(x):
    x.block_until_ready()
    jax.device_get(x.ravel()[:1])  # scalar fetch: true barrier, no bulk pull


def timed_loop(fn, reps=8):
    r = fn()
    block(r)
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    block(r)
    dt = time.perf_counter() - t0
    while dt < 0.5 and reps < 4096:
        reps *= 4
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        block(r)
        dt = time.perf_counter() - t0
    return dt / reps


data = generate_vectors(N, DIM, distribution="embedding",
                        num_clusters=64, seed=42)
from hnsw_tpu.io.persist import load_index  # noqa: E402

t0 = time.perf_counter()
idx = load_index("/tmp/hnsw31k_idx.npz")
corpus = idx.corpus
block(corpus.vectors)
out(stage="loaded", s=round(time.perf_counter() - t0, 1))

g = idx.graph
q = corpus.pad_queries(data[:B])
vec_lp = corpus.vectors.astype(jnp.bfloat16)
entries, _ = sample_entries(corpus.vectors, corpus.sq_norms,
                            idx._entry_rows(), q, metric=corpus.metric)
block(entries)
nbr_pack, nbr_sq = pack_neighbors(vec_lp, corpus.sq_norms, g.adj0)
block(nbr_sq)
upper = g.adj_upper[:0]
out(stage="packed")

# ---- raw kernel timing (args, not closures) -------------------------------
from hnsw_tpu.ops.pallas_hop import hop_score  # noqa: E402

E = 4
kk = jax.random.PRNGKey(1)
sel = jax.random.randint(kk, (B, E), 0, corpus.n, jnp.int32)
dt = timed_loop(lambda: hop_score(nbr_pack, q, sel)[0])
out(op="pallas_hop_score", ms=round(dt * 1e3, 3),
    eff_gbps=round(B * E * 32 * DIM * 2 / dt / 1e9, 1))

# ---- full search program --------------------------------------------------
gt_d, gt_i = exact_topk(corpus.vectors, corpus.sq_norms, q,
                        k=K, n=jnp.int32(corpus.n), metric=corpus.metric)
gt = np.asarray(gt_i)


def recall(rows):
    r = np.asarray(rows)
    return sum(len(set(r[i]) & set(gt[i])) for i in range(B)) / (B * K)


for hop_kernel in ("pallas", None):
    for ef, expand in ((100, 4), (100, 8), (64, 4), (50, 4), (150, 4)):
        if hop_kernel is None and (ef, expand) != (100, 4):
            continue  # one reference point is enough for the slow path

        def call(dbg=False):
            return hnsw_search_batch(
                corpus.vectors, corpus.sq_norms, g.adj0, upper, entries, q,
                k=K, ef=ef, expand=expand, metric=corpus.metric,
                precision="default", vectors_lp=vec_lp,
                nbr_pack=nbr_pack, nbr_sq=nbr_sq,
                hop_kernel=hop_kernel, debug_hops=dbg)

        t0 = time.perf_counter()
        d, r, hops = call(dbg=True)
        block(d)
        t_compile = time.perf_counter() - t0
        rec = recall(r)
        per_batch = timed_loop(lambda: call()[0])
        out(stage="search", hop_kernel=hop_kernel, ef=ef, expand=expand,
            hops=int(hops), compile_s=round(t_compile, 1),
            per_batch_ms=round(per_batch * 1e3, 2),
            qps=round(B / per_batch), recall_at_10=round(rec, 4))
