"""Measurement core.

Replicates the reference's benchmark methodology (bench.clj): build-time
measurement (:98-108), latency percentile tables min/p50/p95/p99/max/avg
computed from sorted samples (:109-122), exact-kNN ground truth via brute
force (:72-84) and recall = |approx ∩ exact| / k averaged over queries
(:86-92), with queries drawn from the corpus itself (self-recall). QPS here
is batched-throughput QPS (batch latency / batch size) — the TPU analogue of
the reference's 20-thread fan-out (parallel_search.clj:51-95) — plus a
single-query latency figure for the 1-thread comparison.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import numpy as np

from hnsw_tpu.config import Mode


def measure_build(build_fn: Callable[[], Any]) -> tuple:
    """Returns (index, seconds)."""
    t0 = time.perf_counter()
    idx = build_fn()
    _sync(idx)
    return idx, time.perf_counter() - t0


def latency_report(samples_ms) -> Dict[str, float]:
    """min/p50/p95/p99/max/avg table (bench.clj:109-122)."""
    s = np.sort(np.asarray(samples_ms, np.float64))
    if len(s) == 0:
        return {}
    pct = lambda p: float(s[min(int(len(s) * p), len(s) - 1)])
    return {
        "min_ms": float(s[0]),
        "p50_ms": pct(0.50),
        "p95_ms": pct(0.95),
        "p99_ms": pct(0.99),
        "max_ms": float(s[-1]),
        "avg_ms": float(s.mean()),
    }


def run_search_benchmark(
    index,
    queries: np.ndarray,
    *,
    k: int = 10,
    mode: Mode = Mode.BALANCED,
    batch_size: int = 256,
    warmup: int = 3,
    iters: int = 10,
    single_query_iters: int = 30,
) -> Dict[str, Any]:
    """Batched-throughput QPS + single-query latency percentiles."""
    import jax.numpy as jnp

    queries = np.asarray(queries, np.float32)
    nq = len(queries)
    b = min(batch_size, nq)
    # pre-stage queries on device once: measurement must not pay the
    # host->device link per call (tunneled setups have ~10-100 ms RTT)
    batch = index.corpus.pad_queries(queries[:b]) if \
        hasattr(index, "corpus") else jnp.asarray(queries[:b])

    search = getattr(index, "search_batch")
    # warmup (compile + cache), like the reference's warmup loops
    # (main.clj:204-210, reproduce_02ms.clj:130-135)
    for _ in range(warmup):
        d, r = search(batch, k, mode)
    _block(d)

    # async pipeline: dispatch all iterations, sync once — sustained
    # throughput, the TPU analogue of the reference's saturated 20-thread
    # pool (parallel_search.clj:51-95)
    t0 = time.perf_counter()
    for _ in range(iters):
        d, r = search(batch, k, mode)
    _block(d)
    dt = (time.perf_counter() - t0) / iters
    qps = b / dt

    # single-query latency samples (synchronous per call: true end-to-end
    # latency including dispatch); single_query_iters=0 skips this — it is
    # one extra compiled program (b=1) per family/mode, and on a tunneled
    # dev relay the number is ~all RTT anyway
    lat = []
    if single_query_iters > 0:
        one = batch[:1]
        for _ in range(3):
            d, _ = search(one, k, mode)
        _block(d)
        for i in range(single_query_iters):
            t0 = time.perf_counter()
            d, _ = search(one, k, mode)
            _block(d)
            lat.append((time.perf_counter() - t0) * 1e3)

    # device-sustained throughput: run many batches inside ONE jitted loop,
    # so per-dispatch overhead (notably remote-relay RTT in tunneled dev
    # setups) is excluded — this is the chip's serving throughput with a
    # colocated host. The repeat count is a TRACED argument (fori_loop with
    # a dynamic trip bound), so the lo and hi slope points share one
    # compiled executable of roughly the direct program's size — not the
    # two stacked-batch lax.scan programs (150-480 MB binaries, one per
    # length) whose cold compiles blew round 2's bench budget.
    # Hop-loop indexes (HNSW-family while_loop programs) opt out via
    # qps_scan_safe=False: loop-wrapped while_loop HLO has crashed the
    # relay's remote compiler (broken pipe), and a dead relay kills every
    # subsequent dispatch in the process — for those the async-pipelined
    # slope below is the sustained number instead.
    qps_device = None
    use_scan = getattr(index, "qps_scan_safe", True)
    try:
        import jax

        # hoist the search's closed-over device arrays (the corpus, packed
        # kernels' shadows, adjacency) into explicit jit arguments: traced
        # under an OUTER jit they would otherwise be baked into the HLO as
        # literal constants, producing 100+ MB executables whose remote
        # compiles blew the round-2 bench budget (jax.closure_convert does
        # not hoist jax.Array constants; make_jaxpr's consts list does)
        cj = jax.make_jaxpr(lambda qb: search(qb, k, mode))(batch)
        consts = cj.consts

        @jax.jit
        def repeated(qb, n_iters, *cs):
            def body(i, acc):
                # loop-variant query perturbation: without it the search is
                # loop-invariant and XLA's LICM computes it once. The factor
                # must survive a bf16 cast (bf16 ULP near 1.0 is 2^-8), so
                # use exact multiples of 2^-4
                scale = 1.0 + (jnp.astype(i % 8, jnp.float32) + 1.0) * 0.0625
                outs = jax.core.eval_jaxpr(cj.jaxpr, cs, qb * scale)
                for o in outs[:2]:            # (distances, rows)
                    acc = acc + jnp.astype(o.reshape(-1)[0], jnp.float32)
                return acc
            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

        def run_timed(inner):
            t0 = time.perf_counter()
            # full value fetch: true sync
            float(repeated(batch, inner, *consts))
            return time.perf_counter() - t0

        def run_pipelined(m):
            # async dispatch pipeline against the ALREADY-COMPILED direct
            # program: per-call dispatch (~2 ms on the relay) overlaps with
            # device compute, so for compute-bound batches the slope is the
            # device time per batch; one final value fetch is the barrier
            t0 = time.perf_counter()
            for _ in range(m):
                d, r = search(batch, k, mode)
            _block(d)
            return time.perf_counter() - t0

        if use_scan:
            float(repeated(batch, 2, *consts))  # compile + warm (once)
            timed = run_timed
        else:
            for _ in range(2):
                d, r = search(batch, k, mode)
            _block(d)
            timed = run_pipelined
        # adaptive two-point slope: grow the repeat count geometrically
        # until measured time clears the relay's noise floor (~80 ms RTT
        # with multi-ms jitter on a pool-shared chip), then difference the
        # last two points. A fixed small count difference under-resolves
        # fast kernels: at ~0.7 ms/batch a 16-batch delta is ~10 ms —
        # inside the noise — which once produced a 24M-QPS reading.
        lo = 4
        n_lo, t_lo = lo, timed(lo)
        n_hi, t_hi = n_lo, t_lo
        while t_hi < 0.35 and n_hi < 4096:
            n_lo, t_lo = n_hi, t_hi
            n_hi = n_hi * 4
            t_hi = timed(n_hi)
        if n_hi == n_lo:                      # first point already slow
            n_hi = 2 * n_lo
            t_hi = timed(n_hi)
        per_batch = (t_hi - t_lo) / (n_hi - n_lo)
        # a relay hiccup inflating t_lo can collapse the difference to
        # ~zero (round-5 run 3 recorded a 2 us/batch artifact this way);
        # the amortized hi-point time is a hard upper bound on the true
        # per-batch cost and a sanity floor on the slope
        if per_batch <= 0 or per_batch < 0.25 * (t_hi / n_hi):
            per_batch = t_hi / n_hi
        qps_device = b / per_batch
    except Exception:
        import os
        if os.environ.get("HNSW_TPU_DEBUG"):
            import traceback
            traceback.print_exc()

    rep = latency_report(lat)
    if qps_device is not None:
        rep["qps_device"] = float(qps_device)
        rep["per_query_us_device"] = 1e6 / qps_device
    rep.update({
        "qps_batched": float(qps),
        "batch_size": b,
        "batch_latency_ms": dt * 1e3,
        "per_query_ms_batched": dt * 1e3 / b,
        "qps_single": 1e3 / rep["avg_ms"] if rep.get("avg_ms") else 0.0,
        "k": k,
        "mode": str(Mode.coerce(mode).value),
    })
    return rep


def run_recall_benchmark(
    index,
    data: np.ndarray,
    *,
    k: int = 10,
    mode: Mode = Mode.BALANCED,
    num_queries: int = 100,
    exact_index=None,
    seed: int = 42,
) -> Dict[str, float]:
    """Recall@k vs the exact flat index (bench.clj:286-310): queries drawn
    from the corpus itself."""
    from hnsw_tpu.models.flat import FlatIndex

    rng = np.random.default_rng(seed)
    n = len(data)
    qidx = rng.choice(n, size=min(num_queries, n), replace=False)
    queries = np.asarray(data, np.float32)[qidx]

    if exact_index is None:
        exact_index = FlatIndex(index.corpus)
    _, exact_rows = exact_index.search_batch(queries, k)
    _, approx_rows = index.search_batch(queries, k, mode)
    exact_rows = np.asarray(exact_rows)
    approx_rows = np.asarray(approx_rows)

    recalls = []
    for a, e in zip(approx_rows, exact_rows):
        ea = set(int(x) for x in e if int(x) >= 0)
        aa = set(int(x) for x in a if int(x) >= 0)
        recalls.append(len(aa & ea) / max(len(ea), 1))
    return {
        "recall_at_k": float(np.mean(recalls)),
        "k": k,
        "num_queries": len(queries),
        "mode": str(Mode.coerce(mode).value),
    }


def _block(x):
    """Synchronize on a device array. Fetches ONE value: on relay-tunneled
    backends block_until_ready can return before execution completes, so a
    value round-trip is the only reliable barrier — but it must be a scalar
    fetch (np.asarray(x) pulls the WHOLE array through the relay; on a 96 MB
    corpus that is minutes of pure transfer)."""
    try:
        x.block_until_ready()
        import jax
        jax.device_get(x.ravel()[:1])
    except AttributeError:
        pass


def _sync(idx):
    for attr in ("corpus",):
        c = getattr(idx, attr, None)
        if c is not None and hasattr(c, "vectors"):
            _block(c.vectors)


def warmup(index, dim: Optional[int] = None, rounds: int = 2):
    """Compile-and-cache warmup — the analogue of warmup-jvm
    (ultra_fast.clj:391-402): run representative searches so later calls hit
    compiled code."""
    import numpy as np

    d = dim or index.corpus.dim
    q = np.zeros((1, d), np.float32)
    qb = np.zeros((min(256, max(index.corpus.n, 1)), d), np.float32)
    for _ in range(rounds):
        index.search_batch(q, min(10, max(index.corpus.n, 1)))
        index.search_batch(qb, min(10, max(index.corpus.n, 1)))
    return index


def build_with_timeout(build_fn, timeout_s: float, fallback_fn=None):
    """Run a build with a wall-clock budget; on timeout, build the fallback
    instead — the reference's timeout-with-fallback-to-Lightning demo
    (bench.clj:573-594). Returns (index, used_fallback)."""
    import threading

    result = {}

    def run():
        try:
            result["idx"] = build_fn()
        except Exception as e:  # surfaced to caller below
            result["err"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive() or "err" in result:
        if fallback_fn is None:
            if "err" in result:
                raise result["err"]
            raise TimeoutError(f"build exceeded {timeout_s}s and no fallback")
        return fallback_fn(), True
    return result["idx"], False
