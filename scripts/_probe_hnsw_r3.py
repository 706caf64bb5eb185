#!/usr/bin/env python
"""Round-3 TPU probe: bisect the HNSW regression seen in the bench recon
(860 QPS @ fast on 31k vs 6.8k in round 1; 34 s warm build vs 2.1 s).

Times, on the real chip:
  1. cold + warm 31k build
  2. layer-0 search per-batch time for the 4 (pack x merge) variants
     plus the hop count taken, at mode fast (ef=100), B=1024
Prints one JSON line per measurement, flushed.
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
from hnsw_tpu.types import Corpus, Metric  # noqa: E402
from hnsw_tpu.models import build_hnsw_index  # noqa: E402
from hnsw_tpu.models.hnsw.search import (  # noqa: E402
    hnsw_search_batch, pack_neighbors, sample_entries,
)

N, DIM, B, K, EF = 31173, 768, 1024, 10, 100


def out(**kw):
    print(json.dumps(kw), flush=True)


def block(x):
    x.block_until_ready()
    np.asarray(x).ravel()[:1]


data = generate_vectors(N, DIM, distribution="embedding",
                        num_clusters=64, seed=42)
corpus = Corpus.from_array(data)
block(corpus.vectors)
out(stage="corpus staged", n=N, dim=DIM, backend=jax.default_backend())

t0 = time.perf_counter()
idx = build_hnsw_index(corpus, M=16)
t_cold = time.perf_counter() - t0
t0 = time.perf_counter()
idx2 = build_hnsw_index(corpus, M=16)
t_warm = time.perf_counter() - t0
out(stage="build", cold_s=round(t_cold, 2), warm_s=round(t_warm, 2))
del idx2

g = idx.graph
q = corpus.pad_queries(data[:B])
vec_lp = corpus.vectors.astype(jnp.bfloat16)
entries, _ = sample_entries(corpus.vectors, corpus.sq_norms,
                            idx._entry_rows(), q, metric=corpus.metric)
block(entries)
nbr_pack, nbr_sq = pack_neighbors(vec_lp, corpus.sq_norms, g.adj0)
block(nbr_sq)
upper = g.adj_upper[:0]


def variant(pack: bool, merge: str):
    def call(dbg=False):
        return hnsw_search_batch(
            corpus.vectors, corpus.sq_norms, g.adj0, upper, entries, q,
            k=K, ef=EF, expand=4, metric=corpus.metric, precision="default",
            vectors_lp=vec_lp,
            nbr_pack=nbr_pack if pack else None,
            nbr_sq=nbr_sq if pack else None,
            merge=merge, debug_hops=dbg)

    t0 = time.perf_counter()
    d, r, hops = call(dbg=True)
    block(d)
    t_compile = time.perf_counter() - t0
    hops = int(hops)
    # warm then pipelined loop
    for _ in range(2):
        d, r = call()
    block(d)
    n_rep = 8
    t0 = time.perf_counter()
    for _ in range(n_rep):
        d, r = call()
    block(d)
    dt = time.perf_counter() - t0
    if dt < 0.4:  # fast variant: re-measure with more reps
        n_rep = 64
        t0 = time.perf_counter()
        for _ in range(n_rep):
            d, r = call()
        block(d)
        dt = time.perf_counter() - t0
    per_batch_ms = dt / n_rep * 1e3
    out(stage="search", pack=pack, merge=merge, hops=hops,
        compile_s=round(t_compile, 1),
        per_batch_ms=round(per_batch_ms, 2),
        per_hop_ms=round(per_batch_ms / max(hops, 1), 3),
        qps=round(B / (per_batch_ms / 1e3)))


for pack in (True, False):
    for merge in ("bitonic", "topk"):
        variant(pack, merge)
