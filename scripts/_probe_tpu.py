"""Round-2 TPU probe: quick family measurements at 31k x 768 (untracked
dev script — bench.py is the canonical artifact)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from hnsw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import numpy as np
from bench import make_corpus, N, DIM, K
from hnsw_tpu.bench.harness import (
    measure_build, run_recall_benchmark, run_search_benchmark,
)
from hnsw_tpu.models import build_hnsw_index, build_ivf_flat_index
from hnsw_tpu.models.flat import FlatIndex
from hnsw_tpu.types import Corpus

import jax
print("backend:", jax.default_backend(), jax.devices(), flush=True)

data = make_corpus()
corpus = Corpus.from_array(data)
corpus.vectors.block_until_ready()
print("corpus staged", flush=True)

out = {}
hnsw, cold_s = measure_build(lambda: build_hnsw_index(corpus, M=16))
_, warm_s = measure_build(lambda: build_hnsw_index(corpus, M=16))
out["hnsw_build_cold_s"] = round(cold_s, 2)
out["hnsw_build_warm_s"] = round(warm_s, 2)
print("build", out, flush=True)

exact = FlatIndex(corpus)
for mode in ["fast", "balanced", "accurate"]:
    r = run_recall_benchmark(hnsw, data, k=K, mode=mode, num_queries=256,
                             exact_index=exact)["recall_at_k"]
    t0 = time.perf_counter()
    p = run_search_benchmark(hnsw, data[:4096], k=K, mode=mode,
                             batch_size=1024, warmup=2, iters=6,
                             single_query_iters=5)
    out[f"hnsw_{mode}"] = {"recall": round(r, 4),
                           "qps_device": round(p.get("qps_device") or 0, 1),
                           "qps_batched": round(p["qps_batched"], 1),
                           "meas_s": round(time.perf_counter() - t0, 1)}
    print(mode, out[f"hnsw_{mode}"], flush=True)

flat_fast = FlatIndex(corpus, precision="bf16")
p = run_search_benchmark(flat_fast, data[:4096], k=K, mode="balanced",
                         batch_size=1024, warmup=2, iters=6,
                         single_query_iters=5)
r = run_recall_benchmark(flat_fast, data, k=K, num_queries=256,
                         exact_index=exact)["recall_at_k"]
out["flat_bf16"] = {"recall": round(r, 4),
                    "qps_device": round(p.get("qps_device") or 0, 1)}
print("flat_bf16", out["flat_bf16"], flush=True)

flat_i8 = FlatIndex(corpus, precision="int8")
p = run_search_benchmark(flat_i8, data[:4096], k=K, mode="balanced",
                         batch_size=1024, warmup=2, iters=6,
                         single_query_iters=5)
r = run_recall_benchmark(flat_i8, data, k=K, num_queries=256,
                         exact_index=exact)["recall_at_k"]
out["flat_int8"] = {"recall": round(r, 4),
                    "qps_device": round(p.get("qps_device") or 0, 1)}
print("flat_int8", out["flat_int8"], flush=True)

ivf, ivf_s = measure_build(lambda: build_ivf_flat_index(
    corpus, num_partitions=128, spill=1))
out["ivf_build_s"] = round(ivf_s, 2)
for mode in ["balanced", "accurate", "precise"]:
    r = run_recall_benchmark(ivf, data, k=K, mode=mode, num_queries=256,
                             exact_index=exact)["recall_at_k"]
    p = run_search_benchmark(ivf, data[:4096], k=K, mode=mode,
                             batch_size=1024, warmup=2, iters=6,
                             single_query_iters=5)
    out[f"ivf_{mode}"] = {"recall": round(r, 4),
                          "qps_device": round(p.get("qps_device") or 0, 1)}
    print(mode, out[f"ivf_{mode}"], flush=True)

print("PROBE_RESULT " + json.dumps(out), flush=True)
