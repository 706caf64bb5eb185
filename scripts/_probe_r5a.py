"""Round-5 probe: int8 scan-kernel bound analysis (VERDICT r4 item 3).

The int8 bucket kernel runs at ~23% of the 394-TOPS int8 MXU while its bf16
twin reaches ~35% of its own peak — the hypothesis is that the int8 kernel
is VPU-EPILOGUE bound: the per-tile selection costs ~14 full-tile VPU
passes, ~3x the int8 matmul time at bt=256/nt=2048. Measures, on the real
chip at the bench shape (31,173 x 768, b=4096):

  a. the full int8 bucket kernel (production baseline)
  b. a matmul-ONLY int8 kernel on identical tiles (the floor)
  c. the packed-key kernel (payload-free min2, ~9 passes)
  d. packed-key at alternative tile geometries
  e. recall@10 of the packed kernel vs exact f32 (coarse-only semantics)

Run: timeout 570 python scripts/_probe_r5a.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N, D, B = 31173, 768, 4096
KPAD = 128


def block(x):
    x.block_until_ready()
    jax.device_get(x.ravel()[:1])


def slope_time(fn, *args):
    """Device-sustained seconds/call: batches run inside ONE jitted
    fori_loop with consts hoisted via make_jaxpr (bench/harness.py recipe)
    so host contention and relay RTT are excluded. The first arg is rolled
    per iteration to defeat LICM."""
    cj = jax.make_jaxpr(lambda *a: fn(*a))(*args)
    consts = tuple(cj.consts)

    @jax.jit
    def repeated(n_iters, args_t, consts_t):
        def body(i, acc):
            a0 = jnp.roll(args_t[0], i % 8, axis=0)
            outs = jax.core.eval_jaxpr(cj.jaxpr, list(consts_t), a0,
                                       *args_t[1:])
            return acc + outs[0].ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

    def run(m):
        t0 = time.perf_counter()
        float(repeated(m, args, consts))
        return time.perf_counter() - t0

    run(2)  # compile + warm
    n_lo, t_lo = 4, run(4)
    n_hi, t_hi = n_lo, t_lo
    while t_hi < 0.35 and n_hi < 4096:
        n_lo, t_lo = n_hi, t_hi
        n_hi *= 4
        t_hi = run(n_hi)
    if n_hi == n_lo:
        n_hi = 2 * n_lo
        t_hi = run(n_hi)
    return (t_hi - t_lo) / (n_hi - n_lo)


def matmul_only_kernel(nt):
    def kernel(n_ref, q_ref, v_ref, vkey_ref, out_ref):
        dots = jnp.dot(q_ref[:], v_ref[:].T,
                       preferred_element_type=jnp.int32)
        out_ref[:] = dots[:, :KPAD]

    return kernel


@functools.partial(jax.jit, static_argnames=("bt", "nt"))
def matmul_only(v8, vkey, q8, n, *, bt, nt):
    n_pad, d = v8.shape
    b = q8.shape[0]
    n_arr = jnp.full((1,), n, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bt, n_pad // nt),
        in_specs=[
            pl.BlockSpec((bt, d), lambda bi, ti, n_ref: (bi, 0)),
            pl.BlockSpec((nt, d), lambda bi, ti, n_ref: (ti, 0)),
            pl.BlockSpec((nt,), lambda bi, ti, n_ref: (ti,)),
        ],
        out_specs=[pl.BlockSpec((bt, KPAD), lambda bi, ti, n_ref: (bi, 0))],
    )
    (out,) = pl.pallas_call(
        matmul_only_kernel(nt), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, KPAD), jnp.int32)],
    )(n_arr, q8, v8, vkey)
    return out


def main():
    import bench
    from hnsw_tpu.ops.pallas_scan import (
        INT8_BT, INT8_NT, pallas_int8_bucket_topk, pallas_int8_packed_topk,
    )
    from hnsw_tpu.types import Metric

    corpus, sample = bench.make_corpus_device(42, N, D)
    n_pad = ((corpus.n_pad + 4096 - 1) // 4096) * 4096
    v = jnp.zeros((n_pad, corpus.d_pad)).at[: corpus.n_pad].set(
        corpus.vectors)
    vmax = jnp.maximum(jnp.max(jnp.abs(v), axis=1, keepdims=True), 1e-12)
    vscale = vmax / 127.0
    v8 = jnp.clip(jnp.round(v / vscale), -127, 127).astype(jnp.int8)
    vs = vscale[:, 0]
    vsq = jnp.zeros((n_pad,)).at[: corpus.n_pad].set(corpus.sq_norms)
    vkey_cos = vs / jnp.sqrt(jnp.maximum(vsq, 1e-12))

    qf = jnp.asarray(sample[:B], jnp.float32)
    qf = jnp.pad(qf, ((0, 0), (0, corpus.d_pad - D)))
    qscale = jnp.maximum(jnp.max(jnp.abs(qf), 1, keepdims=True), 1e-12) / 127.0
    q8 = jnp.clip(jnp.round(qf / qscale), -127, 127).astype(jnp.int8)
    qmeta = jnp.concatenate([qscale, jnp.sum(qf * qf, 1, keepdims=True)], 1)
    v8.block_until_ready()
    flop_q = 2.0 * N * D

    def report(name, sec_per_call, b=B):
        qps = b / sec_per_call
        tops = qps * flop_q / 1e12
        print(f"{name:42s} {sec_per_call*1e3:8.3f} ms/call  "
              f"{qps/1e6:6.2f}M QPS  {tops:6.1f} TOP/s "
              f"({100*tops/394:.0f}% int8 peak)", flush=True)
        return qps

    results = {}
    # a. production bucket kernel
    f = lambda q, qm: pallas_int8_bucket_topk(
        v8, vs, vsq, q, qm, N, k=10, metric=Metric.COSINE,
        bt=INT8_BT, nt=INT8_NT)
    results["bucket_256x2048"] = report(
        "full bucket bt=256 nt=2048", slope_time(f, q8, qmeta))

    # b. matmul-only floor, same tiles
    f = lambda q, qm: matmul_only(v8, vkey_cos, q, N, bt=INT8_BT, nt=INT8_NT)
    results["matmul_256x2048"] = report(
        "matmul-only bt=256 nt=2048", slope_time(f, q8, qmeta))

    # c. packed kernel, same tiles
    f = lambda q, qm: pallas_int8_packed_topk(
        v8, vs, vsq, q, qm, N, k=10, metric=Metric.COSINE,
        bt=INT8_BT, nt=INT8_NT)
    results["packed_256x2048"] = report(
        "packed bt=256 nt=2048", slope_time(f, q8, qmeta))

    # d. geometry variants on the packed kernel
    for bt, nt in ((512, 2048), (1024, 2048), (256, 4096), (512, 4096),
                   (1024, 1024)):
        if n_pad % nt:
            continue
        try:
            f = lambda q, qm, bt=bt, nt=nt: pallas_int8_packed_topk(
                v8, vs, vsq, q, qm, N, k=10, metric=Metric.COSINE,
                bt=bt, nt=nt)
            results[f"packed_{bt}x{nt}"] = report(
                f"packed bt={bt} nt={nt}", slope_time(f, q8, qmeta))
        except Exception as e:
            print(f"packed bt={bt} nt={nt}: {type(e).__name__}: {e}",
                  flush=True)
        # matmul-only floor at the same geometry for the best contenders
        try:
            f = lambda q, qm, bt=bt, nt=nt: matmul_only(
                v8, vkey_cos, q, N, bt=bt, nt=nt)
            results[f"matmul_{bt}x{nt}"] = report(
                f"matmul-only bt={bt} nt={nt}", slope_time(f, q8, qmeta))
        except Exception as e:
            print(f"matmul bt={bt} nt={nt}: {type(e).__name__}: {e}",
                  flush=True)

    # e. packed-kernel recall vs exact f32 (coarse-only)
    from hnsw_tpu.models.flat import FlatIndex
    exact = FlatIndex(corpus)
    _, er = exact.search_batch(sample[:1024], 10)
    dk, rk = pallas_int8_packed_topk(
        v8, vs, vsq, q8, qmeta, N, k=10, metric=Metric.COSINE,
        bt=INT8_BT, nt=INT8_NT)
    er, rk = np.asarray(er), np.asarray(rk)[:1024]
    rec = np.mean([len(set(a.tolist()) & set(e.tolist())) / 10.0
                   for a, e in zip(rk, er)])
    print(f"packed coarse recall@10 vs exact: {rec:.4f}", flush=True)
    print(results)


if __name__ == "__main__":
    main()
