"""Round-4 probe H (real TPU): int8 bucket-kernel tile geometry sweep.

The coarse int8 scan sustains ~95 TOPS (24% of the 394 TOPS v5e int8 peak)
at bt=1024/nt=1024. int8 corpus tiles are half the bytes of bf16, so
nt=2048 fits VMEM at bt<=512 — sweep (bt, nt) for the kernel alone, then
confirm end-to-end FlatIndex coarse QPS at the best shape. Includes a bf16
reference point in the same window so pool-speed variance cancels.

Run: timeout 1800 python scripts/_probe_r4h.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_corpus  # noqa: E402
from hnsw_tpu.models.flat import FlatIndex  # noqa: E402
from hnsw_tpu.types import Corpus  # noqa: E402


def log(**kw):
    print(json.dumps(kw), flush=True)


t0 = time.time()
data = make_corpus()
corpus = Corpus.from_array(data)
corpus.vectors.block_until_ready()
jax.device_get(corpus.vectors.ravel()[:1])
log(stage="staged", s=round(time.time() - t0, 1))

from hnsw_tpu.ops.pallas_scan import (  # noqa: E402
    DEFAULT_NT, pallas_bucket_topk, pallas_int8_bucket_topk,
)

NT0 = 2048
n_pad = ((corpus.n_pad + NT0 - 1) // NT0) * NT0
v = corpus.vectors
vmax = jnp.maximum(jnp.max(jnp.abs(v), axis=1, keepdims=True), 1e-12)
vscale = vmax / 127.0
v8 = jnp.clip(jnp.round(v / vscale), -127, 127).astype(jnp.int8)
v8 = jnp.pad(v8, ((0, n_pad - corpus.n_pad), (0, 0)))
vs = jnp.pad(vscale[:, 0], (0, n_pad - corpus.n_pad))
vsq = jnp.pad(corpus.sq_norms, (0, n_pad - corpus.n_pad))
qf = jnp.asarray(data[:1024], jnp.float32)
qscale = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True), 1e-12) / 127.0
q8 = jnp.clip(jnp.round(qf / qscale), -127, 127).astype(jnp.int8)
qmeta = jnp.concatenate([qscale, jnp.sum(qf * qf, 1, keepdims=True)], 1)

vecb = jnp.pad(corpus.vectors.astype(jnp.bfloat16),
               ((0, n_pad - corpus.n_pad), (0, 0)))
qb = jnp.asarray(data[:1024], jnp.bfloat16)
B = 1024
ops = 2.0 * B * n_pad * corpus.d_pad


def timed(fn, iters=20):
    r = fn()
    jax.block_until_ready(r)
    jax.device_get(r[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    jax.device_get(r[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters


# same-window bf16 reference
dt = timed(lambda: pallas_bucket_topk(vecb, vsq, qb, corpus.n, k=10,
                                      metric=corpus.metric, bt=1024, nt=1024))
log(stage="ref", variant="bf16_bt1024_nt1024", ms=round(dt * 1e3, 3),
    qps=round(B / dt, 1), mfu_bf16=round(ops / dt / 197e12, 3))

for bt, nt in ((1024, 1024), (512, 1024), (512, 2048), (1024, 2048),
               (256, 2048)):
    try:
        dt = timed(lambda: pallas_int8_bucket_topk(
            v8, vs, vsq, q8, qmeta, corpus.n, k=10, metric=corpus.metric,
            bt=bt, nt=nt))
        log(stage="int8", variant=f"bt{bt}_nt{nt}", ms=round(dt * 1e3, 3),
            qps=round(B / dt, 1), tops_pct=round(ops / dt / 394e12, 3))
    except Exception as e:
        log(stage="int8", variant=f"bt{bt}_nt{nt}", error=str(e)[:140])

log(stage="done", total_s=round(time.time() - t0, 1))
