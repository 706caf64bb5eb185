"""Round-4 probe E (real TPU): int8 re-rank fetch sweep, stacked
partitioned build timing, bucket-kernel MFU bound analysis.

Run: timeout 1800 python scripts/_probe_r4e.py [int8 part mfu]
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

from bench import make_corpus  # noqa: E402
from hnsw_tpu.bench.harness import (  # noqa: E402
    measure_build, run_recall_benchmark, run_search_benchmark,
)
from hnsw_tpu.models.flat import FlatIndex  # noqa: E402
from hnsw_tpu.types import Corpus, Metric  # noqa: E402

STAGES = set(sys.argv[1:]) or {"int8", "part", "mfu"}


def log(**kw):
    print(json.dumps(kw), flush=True)


t0 = time.time()
data = make_corpus()
corpus = Corpus.from_array(data)
corpus.vectors.block_until_ready()
jax.device_get(corpus.vectors.ravel()[:1])
log(stage="staged", s=round(time.time() - t0, 1))
exact = FlatIndex(corpus)

if "int8" in STAGES:
    for fetch in (None, 16, 10):
        idx = FlatIndex(corpus, precision="int8", int8_fetch=fetch)
        rec = run_recall_benchmark(idx, data, k=10, num_queries=1024,
                                   exact_index=exact)
        perf = run_search_benchmark(idx, data[:1024], k=10, batch_size=1024,
                                    warmup=2, iters=8, single_query_iters=0)
        log(stage="int8", fetch=fetch, recall=round(rec["recall_at_k"], 4),
            qps=round(perf.get("qps_device") or 0.0, 1))

if "part" in STAGES:
    from hnsw_tpu.models import build_partitioned_hnsw
    part, cold = measure_build(
        lambda: build_partitioned_hnsw(corpus, num_partitions=8))
    part, warm = measure_build(
        lambda: build_partitioned_hnsw(corpus, num_partitions=8))
    log(stage="part_build", cold_s=round(cold, 2), warm_s=round(warm, 2))
    for mode in ("balanced", "accurate", "precise"):
        rec = run_recall_benchmark(part, data, k=10, mode=mode,
                                   num_queries=1024, exact_index=exact)
        perf = run_search_benchmark(part, data[:1024], k=10, mode=mode,
                                    batch_size=1024, warmup=2, iters=6,
                                    single_query_iters=0)
        log(stage="part", mode=mode, recall=round(rec["recall_at_k"], 4),
            qps=round(perf.get("qps_device") or 0.0, 1))

if "mfu" in STAGES:
    # (a) nt sweep on the bucket kernel; (b) a matmul-only pallas kernel on
    # identical tiles — if that also lands near the same time, the bound is
    # the MXU pipeline at these shapes, not our selection epilogue
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from hnsw_tpu.ops.pallas_scan import DEFAULT_NT, pallas_bucket_topk

    n_pad = ((corpus.n_pad + 4096 - 1) // 4096) * 4096
    vec = jnp.zeros((n_pad, corpus.d_pad), jnp.bfloat16)
    vec = vec.at[: corpus.n_pad].set(corpus.vectors.astype(jnp.bfloat16))
    vsq = jnp.zeros((n_pad,), jnp.float32)
    vsq = vsq.at[: corpus.n_pad].set(corpus.sq_norms)
    q = jnp.asarray(data[:1024], jnp.bfloat16)
    flops = 2.0 * 1024 * corpus.n_pad * corpus.d_pad

    def timed(fn):
        r = fn()
        jax.block_until_ready(r)
        jax.device_get(r[0].ravel()[:1])
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r)
        jax.device_get(r[0].ravel()[:1])
        return (time.perf_counter() - t0) / iters

    for nt in (1024,):
        dt = timed(lambda: pallas_bucket_topk(
            vec, vsq, q, corpus.n, k=10, metric=corpus.metric, bt=1024,
            nt=nt))
        log(stage="mfu", variant=f"bucket_nt{nt}", ms=round(dt * 1e3, 3),
            qps=round(1024 / dt, 1), mfu=round(flops / dt / 197e12, 3))

    def mm_kernel(q_ref, v_ref, acc_ref):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _():
            acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
        dots = jnp.dot(q_ref[:], v_ref[:].T,
                       preferred_element_type=jnp.float32)
        # cheapest possible reduction epilogue: accumulate row sums
        acc_ref[:] += jnp.sum(dots.reshape(1024, -1, 128), axis=1)

    @partial(jax.jit, static_argnames=("nt",))
    def mm_only(vec, q, *, nt):
        grid = (1, vec.shape[0] // nt)
        return pl.pallas_call(
            mm_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1024, vec.shape[1]), lambda bi, ti: (bi, 0)),
                pl.BlockSpec((nt, vec.shape[1]), lambda bi, ti: (ti, 0)),
            ],
            out_specs=pl.BlockSpec((1024, 128), lambda bi, ti: (bi, 0)),
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
        )(q, vec)

    for nt in (1024,):
        dt = timed(lambda: (mm_only(vec, q, nt=nt),))
        log(stage="mfu", variant=f"matmul_only_nt{nt}", ms=round(dt * 1e3, 3),
            mfu=round(flops / dt / 197e12, 3))

log(stage="done", total_s=round(time.time() - t0, 1))
