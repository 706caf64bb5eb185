"""Slim TPU probe: HNSW search QPS + recall at 31k, minimal compile count
(untracked dev script)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from hnsw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_corpus, K
from hnsw_tpu.models import build_hnsw_index
from hnsw_tpu.models.flat import FlatIndex
from hnsw_tpu.types import Corpus

print("backend:", jax.default_backend(), flush=True)

data = make_corpus()
corpus = Corpus.from_array(data)
corpus.vectors.block_until_ready()
print("corpus staged", flush=True)

t0 = time.perf_counter()
hnsw = build_hnsw_index(corpus, M=16)
jax.block_until_ready(hnsw.graph.adj0)
print(f"build {time.perf_counter()-t0:.1f}s "
      f"bridges={hnsw.graph.n_bridges}", flush=True)

exact = FlatIndex(corpus)
B = 1024
out = {}
for mode in ["balanced", "accurate"]:
    q = corpus.pad_queries(data[:B])
    t0 = time.perf_counter()
    d, r = hnsw.search_batch(q, K, mode)
    d.block_until_ready()
    print(f"{mode}: first call (compile) {time.perf_counter()-t0:.1f}s",
          flush=True)
    # recall vs exact on 256 queries
    qs = data[:256]
    _, er = exact.search_batch(qs, K)
    _, ar = hnsw.search_batch(qs, K, mode)
    er, ar = np.asarray(er), np.asarray(ar)
    rec = np.mean([len(set(a[a >= 0]) & set(e[e >= 0])) / K
                   for a, e in zip(ar, er)])
    # device-sustained: one scanned program, inner=32, minus a 4-batch run
    mode_ef = {"balanced": None}
    def scanned_factory(inner):
        stacked = jnp.broadcast_to(q, (inner,) + q.shape) * (
            1.0 + jnp.arange(inner, dtype=jnp.float32)[:, None, None] * 1e-4)
        @jax.jit
        def scanned(qb):
            def body(c, x):
                d, r = hnsw.search_batch(x, K, mode)
                return c + d[0, 0] + jnp.float32(r[0, 0]), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), qb)
            return acc
        return scanned, stacked
    t0 = time.perf_counter()
    s32, st32 = scanned_factory(32)
    float(s32(st32))
    print(f"{mode}: scanned32 compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)
    t32 = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(s32(st32))
        t32.append(time.perf_counter() - t0)
    t32 = float(np.median(t32))
    per_batch = (t32 - 0.08) / 32          # subtract ~relay RTT
    qps = B / per_batch
    out[f"hnsw_{mode}"] = {"recall": round(float(rec), 4),
                           "qps_device": round(qps, 0),
                           "t32_s": round(t32, 3)}
    print(mode, out[f"hnsw_{mode}"], flush=True)

print("PROBE_HNSW " + json.dumps(out), flush=True)
