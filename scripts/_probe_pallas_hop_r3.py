#!/usr/bin/env python
"""Round-3 TPU probe #4: Pallas ring-DMA hop kernel vs the XLA gather path,
measured as the FULL production search program (hnsw_search_batch) on the
31k bench corpus. Also times the raw kernel against the raw XLA gather.
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
    t0 = time.perf_counter()
    r = fn()
    block(r)
    compile_s = time.perf_counter() - t0
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    block(r)
    dt = time.perf_counter() - t0
    if dt < 0.4:
        reps = min(max(reps * 8, int(reps * 0.8 / max(dt / reps, 1e-9) / 8)
                       * 8), 4096)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        block(r)
        dt = time.perf_counter() - t0
    return dt / reps, compile_s


t0 = time.perf_counter()
data = generate_vectors(N, DIM, distribution="embedding",
                        num_clusters=64, seed=42)
out(stage="datagen", s=round(time.perf_counter() - t0, 1))
CACHE = "/tmp/hnsw31k_idx.npz"
if os.path.exists(CACHE):
    from hnsw_tpu.io.persist import load_index
    t0 = time.perf_counter()
    idx = load_index(CACHE)
    corpus = idx.corpus
    block(corpus.vectors)
    out(stage="loaded", s=round(time.perf_counter() - t0, 1))
else:
    t0 = time.perf_counter()
    corpus = Corpus.from_array(data)
    block(corpus.vectors)
    out(stage="staged", s=round(time.perf_counter() - t0, 1))
    t0 = time.perf_counter()
    from hnsw_tpu.models.hnsw import HNSWIndex
    from hnsw_tpu.models.hnsw.build import build_graph
    graph = build_graph(
        corpus, m=16,
        progress=lambda st, fr: out(stage="build_tick", at=st,
                                    s=round(time.perf_counter() - t0, 1)))
    idx = HNSWIndex(corpus, graph)
    out(stage="built", s=round(time.perf_counter() - t0, 1))
    from hnsw_tpu.io.persist import save_index
    save_index(idx, CACHE)
    out(stage="saved")

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

# ---- raw kernel vs raw XLA gather (E=4) -----------------------------------
from hnsw_tpu.ops.pallas_hop import hop_score  # noqa: E402

E = 4
kk = jax.random.PRNGKey(1)
sel = jax.random.randint(kk, (B, E), 0, corpus.n, jnp.int32)
qlp = q.astype(jnp.bfloat16)


@jax.jit
def xla_gather_score(qq, sel):
    blocks = jnp.take(nbr_pack, sel, axis=0)
    dots = jnp.einsum("bd,bemd->bem", qq.astype(blocks.dtype), blocks,
                      preferred_element_type=jnp.float32)
    return dots.reshape(B, E * 32)


for name, fn in [
    ("pallas_hop_score", lambda: hop_score(nbr_pack, qlp, sel)[0]),
    ("xla_gather_score", lambda: xla_gather_score(qlp, sel)),
]:
    dt, comp = timed_loop(fn)
    out(op=name, ms=round(dt * 1e3, 3), compile_s=round(comp, 1),
        eff_gbps=round(B * E * 32 * DIM * 2 / dt / 1e9, 1))

# ---- full search program --------------------------------------------------
gt_d, gt_i = exact_topk(corpus.vectors, corpus.sq_norms, q,
                        k=K, n=jnp.int32(corpus.n), metric=corpus.metric)
gt = np.asarray(gt_i)


def recall(rows):
    r = np.asarray(rows)
    return sum(len(set(r[i]) & set(gt[i])) for i in range(B)) / (B * K)


for hop_kernel in ("pallas", None):
    for expand in (4, 8):
        def call(dbg=False):
            return hnsw_search_batch(
                corpus.vectors, corpus.sq_norms, g.adj0, upper, entries, q,
                k=K, ef=EF, expand=expand, metric=corpus.metric,
                precision="default", vectors_lp=vec_lp,
                nbr_pack=nbr_pack, nbr_sq=nbr_sq,
                hop_kernel=hop_kernel, debug_hops=dbg)

        t0 = time.perf_counter()
        d, r, hops = call(dbg=True)
        block(d)
        t_compile = time.perf_counter() - t0
        rec = recall(r)
        per_batch, _ = timed_loop(lambda: call()[0])
        out(stage="search", hop_kernel=hop_kernel, expand=expand,
            hops=int(hops), compile_s=round(t_compile, 1),
            per_batch_ms=round(per_batch * 1e3, 2),
            qps=round(B / per_batch), recall_at_10=round(rec, 4))
