"""Round-4 probe A (real TPU): hop-kernel csq change, bf16 build speed +
stage timings, rerank=4k recall/QPS on HNSW, shared-beam IVF-HNSW and
partitioned QPS/recall. One process, compile cache on.

Run: timeout 1800 python scripts/_probe_r4a.py [stage...]
Stages: kernel build hnsw ivfh part   (default: all)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from bench import make_corpus  # noqa: E402
from hnsw_tpu.bench.harness import (  # noqa: E402
    measure_build, run_recall_benchmark, run_search_benchmark,
)
from hnsw_tpu.models.flat import FlatIndex  # noqa: E402
from hnsw_tpu.types import Corpus  # noqa: E402

STAGES = set(sys.argv[1:]) or {"kernel", "build", "hnsw", "ivfh", "part"}


def log(**kw):
    print(json.dumps(kw), flush=True)


t0 = time.time()
data = make_corpus()
corpus = Corpus.from_array(data)
corpus.vectors.block_until_ready()
jax.device_get(corpus.vectors.ravel()[:1])
log(stage="staged", s=round(time.time() - t0, 1),
    backend=jax.default_backend())
exact = FlatIndex(corpus)

if "kernel" in STAGES:
    # hop_score vs XLA reference on a production-shaped call
    from hnsw_tpu.ops.pallas_hop import hop_score
    rng = np.random.default_rng(0)
    vec_lp = corpus.vectors.astype(jnp.bfloat16)
    adj = jnp.asarray(rng.integers(0, corpus.n, (corpus.n_pad, 32)),
                      jnp.int32)
    from hnsw_tpu.models.hnsw.search import pack_neighbors
    pack, _ = pack_neighbors(vec_lp, corpus.sq_norms, adj)
    q = jnp.asarray(data[:1024])
    sel = jnp.asarray(rng.integers(0, corpus.n, (1024, 4)), jnp.int32)
    t = time.time()
    dots, csq = hop_score(pack, q, sel)
    dots.block_until_ready()
    blocks = jnp.take(pack, sel, axis=0).reshape(1024, -1, 768)
    ref_dots = jnp.einsum("bd,bcd->bc", q.astype(jnp.bfloat16), blocks,
                          preferred_element_type=jnp.float32)
    ref_csq = jnp.sum(blocks.astype(jnp.float32) ** 2, axis=-1)
    err_d = float(jnp.max(jnp.abs(dots - ref_dots)))
    err_c = float(jnp.max(jnp.abs(csq - ref_csq) / jnp.maximum(ref_csq, 1e-6)))
    log(stage="kernel", max_abs_dots_err=err_d, max_rel_csq_err=err_c,
        compile_s=round(time.time() - t, 1))

if "build" in STAGES:
    from hnsw_tpu.models import build_hnsw_index
    stage_t = {}

    def _build():
        marks = []
        g = build_hnsw_index(
            corpus, M=16,
            progress=lambda s, f: marks.append((s, f, time.perf_counter())))
        for (s0, f0, ta), (_, _, tb) in zip(marks, marks[1:]):
            key = "upper" if s0.startswith("layer") and s0 != "layer0" else s0
            stage_t[key] = round(stage_t.get(key, 0.0) + (tb - ta), 3)
        return g

    hnsw, cold = measure_build(_build)
    stage_t.clear()
    hnsw, warm = measure_build(_build)
    log(stage="build", cold_s=round(cold, 2), warm_s=round(warm, 3),
        stages=dict(stage_t))
else:
    from hnsw_tpu.models import build_hnsw_index
    hnsw, _ = measure_build(lambda: build_hnsw_index(corpus, M=16))

if "hnsw" in STAGES:
    for mode in ("turbo", "fast"):
        rec = run_recall_benchmark(hnsw, data, k=10, mode=mode,
                                   num_queries=1024, exact_index=exact)
        perf = run_search_benchmark(hnsw, data[:1024], k=10, mode=mode,
                                    batch_size=1024, warmup=2, iters=6,
                                    single_query_iters=0)
        log(stage="hnsw", mode=mode,
            recall=round(rec["recall_at_k"], 4),
            qps=round(perf.get("qps_device") or 0.0, 1))

if "ivfh" in STAGES:
    from hnsw_tpu.models import build_ivf_hnsw_index
    ivfh, b_s = measure_build(
        lambda: build_ivf_hnsw_index(corpus, num_partitions=32))
    log(stage="ivfh_build", s=round(b_s, 2))
    for mode in ("balanced", "accurate", "precise"):
        rec = run_recall_benchmark(ivfh, data, k=10, mode=mode,
                                   num_queries=1024, exact_index=exact)
        perf = run_search_benchmark(ivfh, data[:1024], k=10, mode=mode,
                                    batch_size=1024, warmup=2, iters=6,
                                    single_query_iters=0)
        log(stage="ivfh", mode=mode, recall=round(rec["recall_at_k"], 4),
            qps=round(perf.get("qps_device") or 0.0, 1))

if "part" in STAGES:
    from hnsw_tpu.models import build_partitioned_hnsw
    part, b_s = measure_build(
        lambda: build_partitioned_hnsw(corpus, num_partitions=8))
    log(stage="part_build", s=round(b_s, 2))
    for mode in ("turbo", "fast", "balanced", "precise"):
        rec = run_recall_benchmark(part, data, k=10, mode=mode,
                                   num_queries=1024, exact_index=exact)
        perf = run_search_benchmark(part, data[:1024], k=10, mode=mode,
                                    batch_size=1024, warmup=2, iters=6,
                                    single_query_iters=0)
        log(stage="part", mode=mode, recall=round(rec["recall_at_k"], 4),
            qps=round(perf.get("qps_device") or 0.0, 1))

log(stage="done", total_s=round(time.time() - t0, 1))
