"""Round-2 validation probe (untracked dev script): FlatIndex bucket paths
+ HNSW presorted-merge search, on the real TPU at 31k x 768."""
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

exact = FlatIndex(corpus)
B = 1024
q_np = data[:B]
out = {}


def recall_of(idx, mode="balanced", nq=256):
    qs = data[:nq]
    _, er = exact.search_batch(qs, K)
    _, ar = idx.search_batch(qs, K, mode)
    er, ar = np.asarray(er), np.asarray(ar)
    return float(np.mean([
        len(set(a[a >= 0]) & set(e[e >= 0])) / K for a, e in zip(ar, er)]))


def qps_device(idx, mode="balanced", inner_lo=4, inner_hi=24):
    q = corpus.pad_queries(q_np)

    def run(inner):
        stacked = jnp.broadcast_to(q, (inner,) + q.shape) * (
            1.0 + jnp.arange(inner, dtype=jnp.float32)[:, None, None]
            * 1e-2 / inner)

        @jax.jit
        def scanned(qb):
            def body(c, x):
                d, r = idx.search_batch(x, K, mode)
                return c + d[0, 0] + jnp.float32(r[0, 0]), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), qb)
            return acc
        float(scanned(stacked))
        t0 = time.perf_counter()
        float(scanned(stacked))
        return time.perf_counter() - t0
    t_lo, t_hi = run(inner_lo), run(inner_hi)
    per = (t_hi - t_lo) / (inner_hi - inner_lo)
    if per <= 0:
        per = t_hi / inner_hi
    return B / per


for name, idx in [
    ("flat_bf16_bucket", FlatIndex(corpus, precision="bf16")),
    ("flat_int8_bucket", FlatIndex(corpus, precision="int8")),
]:
    t0 = time.perf_counter()
    r = recall_of(idx)
    qps = qps_device(idx)
    out[name] = {"recall": round(r, 4), "qps_device": round(qps, 0),
                 "wall_s": round(time.perf_counter() - t0, 1)}
    print(name, out[name], flush=True)

t0 = time.perf_counter()
hnsw = build_hnsw_index(corpus, M=16)
jax.block_until_ready(hnsw.graph.adj0)
out["hnsw_build_s"] = round(time.perf_counter() - t0, 1)
print("hnsw built", out["hnsw_build_s"], "s, bridges",
      hnsw.graph.n_bridges, flush=True)

for mode in ["balanced", "accurate"]:
    t0 = time.perf_counter()
    r = recall_of(hnsw, mode)
    qps = qps_device(hnsw, mode)
    out[f"hnsw_{mode}"] = {"recall": round(r, 4),
                           "qps_device": round(qps, 0),
                           "wall_s": round(time.perf_counter() - t0, 1)}
    print(mode, out[f"hnsw_{mode}"], flush=True)

print("PROBE_R2 " + json.dumps(out), flush=True)
