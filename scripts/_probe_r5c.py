"""Round-5 probe c: follow-ups to _probe_r5a/b.

1. CORRECTED int8 matmul-only floor: _probe_r5a's matmul-only kernel wrote
   only dots[:, :128], so Mosaic dead-code-eliminated most of the GEMM at
   bt >= 512 (readings up to "362% of peak"). This one consumes every dot
   via a g-axis min (one extra VPU pass), giving an honest floor.
2. Partitioned mid-ladder points ef in {400, 420, 450} at expand=8, now
   that the Pallas hop kernel is auto-eligible at c=256 (the r5b force=True
   result made eligibility accounting match the real compile).
3. IVF-HNSW at expand=8 vs its default 4 (same eligibility unlock).

Run: timeout 570 python scripts/_probe_r5c.py
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


def slope_time(fn, *args):
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

    run(2)
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


def matmul_min_kernel(nt):
    g = nt // KPAD

    def kernel(n_ref, q_ref, v_ref, vkey_ref, out_ref):
        dots = jnp.dot(q_ref[:], v_ref[:].T,
                       preferred_element_type=jnp.int32)
        bt = dots.shape[0]
        out_ref[:] = jnp.min(dots.reshape(bt, g, KPAD), axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("bt", "nt"))
def matmul_min(v8, vkey, q8, n, *, bt, nt):
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
        matmul_min_kernel(nt), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, KPAD), jnp.int32)],
    )(n_arr, q8, v8, vkey)
    return out


class V:
    qps_scan_safe = False

    def __init__(self, idx, ef=None, expand=None, kpp=None, mode="balanced"):
        self.idx, self.ef, self.expand, self.kpp = idx, ef, expand, kpp
        self.mode = mode
        self.corpus = idx.corpus

    def search_batch(self, q, k, mode=None):
        if self.expand is not None:
            self.idx.expand = self.expand
        kw = {}
        if self.ef is not None:
            kw["ef"] = self.ef
        if self.kpp is not None:
            kw["k_per_partition"] = self.kpp
        return self.idx.search_batch(q, k, mode or self.mode, **kw)


def main():
    import bench
    from hnsw_tpu.bench.harness import run_search_benchmark
    from hnsw_tpu.models.flat import FlatIndex

    corpus, sample = bench.make_corpus_device(42, N, D)
    data = sample

    # --- 1. corrected matmul floor -----------------------------------
    n_pad = ((corpus.n_pad + 4096 - 1) // 4096) * 4096
    v = jnp.zeros((n_pad, corpus.d_pad)).at[: corpus.n_pad].set(
        corpus.vectors)
    vmax = jnp.maximum(jnp.max(jnp.abs(v), axis=1, keepdims=True), 1e-12)
    vscale = vmax / 127.0
    v8 = jnp.clip(jnp.round(v / vscale), -127, 127).astype(jnp.int8)
    vsq = jnp.zeros((n_pad,)).at[: corpus.n_pad].set(corpus.sq_norms)
    vkey = vscale[:, 0] / jnp.sqrt(jnp.maximum(vsq, 1e-12))
    qf = jnp.pad(jnp.asarray(sample[:B], jnp.float32),
                 ((0, 0), (0, corpus.d_pad - D)))
    qscale = jnp.maximum(jnp.max(jnp.abs(qf), 1, keepdims=True), 1e-12) / 127.
    q8 = jnp.clip(jnp.round(qf / qscale), -127, 127).astype(jnp.int8)
    for bt, nt in ((256, 2048), (512, 2048), (1024, 2048)):
        try:
            f = lambda q, bt=bt, nt=nt: matmul_min(v8, vkey, q, N, bt=bt,
                                                   nt=nt)
            s = slope_time(f, q8)
            print(f"matmul+min floor bt={bt} nt={nt}: {s*1e3:.3f} ms/call "
                  f"{B/s/1e6:.2f}M QPS", flush=True)
        except Exception as e:
            print(f"matmul+min bt={bt} nt={nt}: {type(e).__name__}", flush=True)

    exact = FlatIndex(corpus)
    _, er = exact.search_batch(data[:1024], 10)
    er = np.asarray(er)

    def measure(v, label):
        try:
            _, ar = v.search_batch(data[:1024], 10)
            ar = np.asarray(ar)
            rec = np.mean([len(set(a.tolist()) & set(x.tolist())) / 10.0
                           for a, x in zip(ar, er)])
            perf = run_search_benchmark(v, data[:1024], k=10,
                                        batch_size=1024, warmup=1, iters=4,
                                        single_query_iters=0)
            print(f"{label}: recall={rec:.4f} "
                  f"qps={perf.get('qps_device') or 0:.0f}", flush=True)
        except Exception as ex:
            print(f"{label}: {type(ex).__name__}: {ex}", flush=True)

    # --- 2. partitioned mid-ladder (eligibility fix live) -------------
    from hnsw_tpu.models import build_partitioned_hnsw
    pidx = build_partitioned_hnsw(corpus, num_partitions=8)
    for ef in (400, 420, 450, 500):
        measure(V(pidx, ef=ef, expand=8), f"partitioned ef={ef} e=8")
    del pidx

    # --- 3. IVF-HNSW expand 4 vs 8 ------------------------------------
    from hnsw_tpu.models import build_ivf_hnsw_index
    ivfh = build_ivf_hnsw_index(corpus, num_partitions=32)
    for e in (4, 8):
        for mode in ("balanced", "accurate", "precise"):
            measure(V(ivfh, expand=e, mode=mode), f"ivf_hnsw e={e} {mode}")


if __name__ == "__main__":
    main()
