"""Round-4 probe F (real TPU): headline-kernel MFU attack.

Questions, in order of leverage:
  (a) What does a PLAIN XLA bf16 GEMM of the headline shape sustain on this
      chip?  That is the practical ceiling: if XLA's own matmul pipeline
      lands at ~the bucket kernel's 34-37% MFU, the kernel is at chip speed
      of light for this (pool-shared) part and we record that as evidence.
  (b) Does a K-major corpus layout ([D, N] blocks, dot contracting q dim 1
      with v dim 0 — "NN" gemm) beat the current [N, D] blocks + v.T ("NT")?
      Mosaic may be paying a per-tile relayout for the transpose.
  (c) nt/bt sweep on the matmul-only kernel (512/1024 x 512/1024/2048 where
      VMEM allows) with dimension_semantics=(parallel, arbitrary).

Run: timeout 1800 python scripts/_probe_r4f.py [xla nt kmajor bucket]
"""
import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from bench import make_corpus  # noqa: E402
from hnsw_tpu.types import Corpus  # noqa: E402

STAGES = set(sys.argv[1:]) or {"xla", "nt", "kmajor", "bucket"}
PEAK = 197e12


def log(**kw):
    print(json.dumps(kw), flush=True)


t0 = time.time()
data = make_corpus()
corpus = Corpus.from_array(data)
corpus.vectors.block_until_ready()
jax.device_get(corpus.vectors.ravel()[:1])
log(stage="staged", s=round(time.time() - t0, 1))

n_pad = ((corpus.n_pad + 4096 - 1) // 4096) * 4096
vec = jnp.zeros((n_pad, corpus.d_pad), jnp.bfloat16)
vec = vec.at[: corpus.n_pad].set(corpus.vectors.astype(jnp.bfloat16))
vecT = jnp.asarray(vec.T)                        # [D, N] K-major copy
vsq = jnp.zeros((n_pad,), jnp.float32)
vsq = vsq.at[: corpus.n_pad].set(corpus.sq_norms)
q = jnp.asarray(data[:1024], jnp.bfloat16)
B = 1024
flops = 2.0 * B * n_pad * corpus.d_pad


def timed(fn, iters=20):
    r = fn()
    jax.block_until_ready(r)
    jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters


if "xla" in STAGES:
    # (a) plain XLA GEMMs: scores materialized in HBM (one reduction to keep
    # the output small and the timing honest about the gemm itself)
    @jax.jit
    def xla_nt(q, vec):
        s = jax.lax.dot_general(q, vec, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.sum(s.reshape(B, -1, 128), axis=1)

    @jax.jit
    def xla_nn(q, vecT):
        s = jax.lax.dot_general(q, vecT, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.sum(s.reshape(B, -1, 128), axis=1)

    for name, fn in (("xla_NT", lambda: xla_nt(q, vec)),
                     ("xla_NN", lambda: xla_nn(q, vecT))):
        dt = timed(fn)
        log(stage="xla", variant=name, ms=round(dt * 1e3, 3),
            mfu=round(flops / dt / PEAK, 3))


def mm_only_factory(bt, nt, kmajor):
    if kmajor:
        def kernel(q_ref, v_ref, acc_ref):
            ti = pl.program_id(1)

            @pl.when(ti == 0)
            def _():
                acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
            dots = jax.lax.dot_general(
                q_ref[:], v_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[:] += jnp.sum(dots.reshape(bt, -1, 128), axis=1)

        @jax.jit
        def run(vecT, q):
            return pl.pallas_call(
                kernel,
                grid=(B // bt, vecT.shape[1] // nt),
                in_specs=[
                    pl.BlockSpec((bt, vecT.shape[0]), lambda bi, ti: (bi, 0)),
                    pl.BlockSpec((vecT.shape[0], nt), lambda bi, ti: (0, ti)),
                ],
                out_specs=pl.BlockSpec((bt, 128), lambda bi, ti: (bi, 0)),
                out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )(q, vecT)
        return lambda: run(vecT, q)
    else:
        def kernel(q_ref, v_ref, acc_ref):
            ti = pl.program_id(1)

            @pl.when(ti == 0)
            def _():
                acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
            dots = jax.lax.dot_general(
                q_ref[:], v_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[:] += jnp.sum(dots.reshape(bt, -1, 128), axis=1)

        @jax.jit
        def run(vec, q):
            return pl.pallas_call(
                kernel,
                grid=(B // bt, vec.shape[0] // nt),
                in_specs=[
                    pl.BlockSpec((bt, vec.shape[1]), lambda bi, ti: (bi, 0)),
                    pl.BlockSpec((nt, vec.shape[1]), lambda bi, ti: (ti, 0)),
                ],
                out_specs=pl.BlockSpec((bt, 128), lambda bi, ti: (bi, 0)),
                out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )(q, vec)
        return lambda: run(vec, q)


if "nt" in STAGES:
    for bt, nt in ((1024, 512), (1024, 1024), (512, 1024), (512, 2048)):
        try:
            dt = timed(mm_only_factory(bt, nt, kmajor=False))
            log(stage="nt", variant=f"mm_NT_bt{bt}_nt{nt}",
                ms=round(dt * 1e3, 3), mfu=round(flops / dt / PEAK, 3))
        except Exception as e:  # VMEM overflow etc.
            log(stage="nt", variant=f"mm_NT_bt{bt}_nt{nt}",
                error=str(e)[:160])

if "kmajor" in STAGES:
    for bt, nt in ((1024, 1024), (512, 2048), (1024, 2048)):
        try:
            dt = timed(mm_only_factory(bt, nt, kmajor=True))
            log(stage="kmajor", variant=f"mm_NN_bt{bt}_nt{nt}",
                ms=round(dt * 1e3, 3), mfu=round(flops / dt / PEAK, 3))
        except Exception as e:
            log(stage="kmajor", variant=f"mm_NN_bt{bt}_nt{nt}",
                error=str(e)[:160])

if "bucket" in STAGES:
    from hnsw_tpu.ops.pallas_scan import pallas_bucket_topk

    for bt, nt in ((1024, 1024), (512, 1024), (1024, 512)):
        try:
            dt = timed(lambda: pallas_bucket_topk(
                vec, vsq, q, corpus.n, k=10, metric=corpus.metric,
                bt=bt, nt=nt))
            log(stage="bucket", variant=f"bucket_bt{bt}_nt{nt}",
                ms=round(dt * 1e3, 3), qps=round(B / dt, 1),
                mfu=round(flops / dt / PEAK, 3))
        except Exception as e:
            log(stage="bucket", variant=f"bucket_bt{bt}_nt{nt}",
                error=str(e)[:160])

log(stage="done", total_s=round(time.time() - t0, 1))
