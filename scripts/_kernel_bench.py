"""Kernel-variant microbenchmark on the real TPU (untracked dev script).

Compares pallas_exact_topk vs pallas_bucket_topk (bf16) and
pallas_int8_topk vs pallas_int8_bucket_topk at 31k x 768, plus nt/bt
variants, reporting sustained per-batch seconds via the two-point-slope
method (excludes relay RTT)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from hnsw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from hnsw_tpu.ops.pallas_scan import (
    pallas_bucket_topk, pallas_exact_topk, pallas_int8_bucket_topk,
    pallas_int8_topk,
)
from hnsw_tpu.types import Metric

print("backend:", jax.default_backend(), flush=True)

N, D, K, B = 31173, 768, 10, 1024
NT = 1024
N_PAD = ((N + NT - 1) // NT) * NT
rng = np.random.default_rng(42)
v = rng.standard_normal((N_PAD, D)).astype(np.float32)
v[N:] = 0
v[:N] /= np.linalg.norm(v[:N], axis=1, keepdims=True)
q = v[:B].copy()

v_bf = jnp.asarray(v, jnp.bfloat16)
vsq = jnp.sum(jnp.asarray(v) ** 2, axis=1)
q_bf = jnp.asarray(q, jnp.bfloat16)

vmax = np.maximum(np.abs(v).max(axis=1, keepdims=True), 1e-12)
vscale = (vmax / 127.0).astype(np.float32)
v8 = jnp.asarray(np.clip(np.round(v / vscale), -127, 127), jnp.int8)
qmax = np.maximum(np.abs(q).max(axis=1, keepdims=True), 1e-12)
qscale = (qmax / 127.0).astype(np.float32)
q8 = jnp.asarray(np.clip(np.round(q / qscale), -127, 127), jnp.int8)
qmeta = jnp.asarray(
    np.concatenate([qscale, (q * q).sum(1, keepdims=True)], axis=1))
vscale_j = jnp.asarray(vscale[:, 0])


def timed(fn, reps_lo=4, reps_hi=20):
    def run(reps):
        @jax.jit
        def scanned(_):
            def body(carry, i):
                d, r = fn()
                return carry + d[0, 0] + jnp.float32(r[0, 0]), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(reps))
            return acc
        float(scanned(0))
        t0 = time.perf_counter()
        float(scanned(0))
        return time.perf_counter() - t0
    t_lo, t_hi = run(reps_lo), run(reps_hi)
    per = (t_hi - t_lo) / (reps_hi - reps_lo)
    return per if per > 0 else t_hi / reps_hi


FLOP = 2.0 * B * N_PAD * D
out = {}
for name, fn in [
    ("bf16_exact_bt512", lambda: pallas_exact_topk(
        v_bf, vsq, q_bf[:512], N, k=K, metric=Metric.COSINE, bt=512)),
    ("bf16_bucket_bt512", lambda: pallas_bucket_topk(
        v_bf, vsq, q_bf[:512], N, k=K, metric=Metric.COSINE, bt=512)),
    ("bf16_bucket_bt256", lambda: pallas_bucket_topk(
        v_bf, vsq, q_bf[:256], N, k=K, metric=Metric.COSINE, bt=256)),
    ("bf16_bucket_bt1024", lambda: pallas_bucket_topk(
        v_bf, vsq, q_bf, N, k=K, metric=Metric.COSINE, bt=1024)),
    ("bf16_bucket_nt2048_bt512", lambda: pallas_bucket_topk(
        v_bf, vsq, q_bf[:512], N, k=K, metric=Metric.COSINE, bt=512,
        nt=2048)),
    ("int8_exact_bt256", lambda: pallas_int8_topk(
        v8, vscale_j, vsq, q8[:256], qmeta[:256], N, k=K,
        metric=Metric.COSINE, bt=256)),
    ("int8_bucket_bt512", lambda: pallas_int8_bucket_topk(
        v8, vscale_j, vsq, q8[:512], qmeta[:512], N, k=K,
        metric=Metric.COSINE, bt=512)),
    ("int8_bucket_bt1024", lambda: pallas_int8_bucket_topk(
        v8, vscale_j, vsq, q8, qmeta, N, k=K,
        metric=Metric.COSINE, bt=1024)),
]:
    try:
        bt = int(name.split("bt")[-1])
        per = timed(fn)
        qps = bt / per
        flop = 2.0 * bt * N_PAD * D
        out[name] = {"per_batch_ms": round(per * 1e3, 3),
                     "qps": round(qps, 0),
                     "tflops": round(flop / per / 1e12, 1)}
        print(name, out[name], flush=True)
    except Exception as e:
        out[name] = {"error": f"{type(e).__name__}: {e}"}
        print(name, "ERR", str(e)[:200], flush=True)

print("KERNELBENCH " + json.dumps(out), flush=True)
