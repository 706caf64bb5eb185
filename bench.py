#!/usr/bin/env python
"""Headline benchmark: QPS/chip at recall@10 >= 0.98 on a Bible-shaped corpus
(31,173 x 768, unit-normalized — the reference's dataset shape; the real
corpus JSON is not distributed with the reference repo, so a seeded
mpnet-shaped clustered synthetic stands in), plus HNSW build time.

Baseline: the reference's best published numbers — 5,376 QPS at 20 threads
with ~0.99 recall and a 215 s index build (reference README.md:27,
BASELINE.md).

Methodology: every index family is a legitimate engine choice; the headline
is the fastest family/mode combination whose measured recall@10 clears 0.98
(on this corpus size that is the coarse-only int8 Pallas scan @ ~0.99
recall — the TPU-native answer to this workload; HNSW and IVF numbers are
reported alongside). QPS is chip-sustained throughput: batches run inside one
dispatch, excluding this dev environment's ~76 ms relay RTT per call (a real
deployment's colocated-host dispatch overhead is microseconds).

Output protocol (two channels, both updated after EVERY measured family and
scale size so a kill at any point still captures everything so far):
  stdout   — ONE COMPACT self-contained JSON line (<~1.5 KB: families as
             [recall, qps] pairs, scale summary, build/latency figures).
             The driver keeps a bounded tail of stdout and parses the LAST
             line, so the final line must stay small: round 3 was rc=0 but
             parsed:null because the full-detail line (~4 KB with every
             recall_by_mode map) outgrew the tail capture.
  file     — the FULL state (recall_by_mode sweeps, per-size family detail,
             batch scaling) appended per emit to PROGRESS_bench_driver.jsonl
             next to this script.
The whole run is budgeted: work is ordered cheapest-compile-first and each
step checks the remaining wall-clock before starting.
"""

import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("HNSW_TPU_BENCH_N", "31173"))   # verses (README.md:22)
DIM = int(os.environ.get("HNSW_TPU_BENCH_DIM", "768"))  # mpnet-v2 dim
K = 10
RECALL_TARGET = 0.98
BASELINE_QPS = 5376.0     # reference 20-thread peak (README.md:27)
BASELINE_BUILD_S = 215.0  # reference sequential HNSW build (README.md:245)

# family-appropriate recall bars for the MODE SWEEP (the headline pool still
# requires >= 0.98): LSH's reference operating band is ~45% recall
# (reference README.md:92) and IVF-HNSW's is 85-90% (README.md:99) — probing
# those families all the way to :precise chasing 0.98 just benches them at
# their priciest knob (round-3 weak #5).
FAMILY_TARGET = {"lsh": 0.45, "ivf_hnsw": 0.85}

# size sweep beyond the reference's published 1k/10k/31k/100k(est) curve
# (reference README.md:241-249); override with HNSW_TPU_SCALE="n1,n2" or
# disable with HNSW_TPU_SCALE="". Sizes run IN THIS ORDER (not sorted):
# the 1M graph row is the round-5 deliverable, so it runs before the
# (r4-proven) 500k row and inherits the budget risk last.
SCALE_SIZES = [int(s) for s in os.environ.get(
    "HNSW_TPU_SCALE", "100000,1000000,500000").split(",") if s]

# wall-clock budget for the whole bench run, checked before every family,
# every mode probe, and every scale size: when exhausted, whatever has been
# measured is already on stdout (the driver runs this unattended at round
# end; a size/family already in flight can still overrun by its own
# duration — the budget bounds STARTING new work, not preempting it)
BUDGET_S = float(os.environ.get("HNSW_TPU_BENCH_BUDGET_S", "2600"))
_T0 = time.perf_counter()

PROGRESS_PATH = os.environ.get(
    "HNSW_TPU_BENCH_PROGRESS",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "PROGRESS_bench_driver.jsonl"))


def remaining_s() -> float:
    return BUDGET_S - (time.perf_counter() - _T0)


STATE = {
    "metric": "qps_per_chip_at_recall@10>=0.98_31173x768",
    "value": 0.0,
    "unit": "qps/chip",
    "vs_baseline": 0.0,
    "families": {},
    "scale": {},
}


def _compact():
    """The <~1.5 KB summary the driver parses: headline + one [recall, qps]
    pair per family + per-size scale digest + build/latency figures."""
    c = {k: STATE[k] for k in (
        "metric", "value", "unit", "vs_baseline", "headline_family",
        "headline_recall_at_10") if k in STATE}
    fams = {}
    for f, r in STATE["families"].items():
        if "recall_at_10" in r:
            fams[f] = [round(r["recall_at_10"], 3),
                       int(r.get("qps_device") or r.get("qps_dispatched", 0))]
            # cross-batch QPS is not directly comparable: families measured
            # at a non-default batch carry it as a third element (the fused
            # scans saturate at b=4096, everything else runs b=1024)
            if "batch_size" in r:
                fams[f].append(r["batch_size"])
        else:
            fams[f] = "error"
    c["families"] = fams
    scale = {}
    for n, e in STATE["scale"].items():
        s = {}
        for f, v in e.get("families", {}).items():
            if "recall_at_10" in v:
                s[f] = [round(v["recall_at_10"], 3),
                        int(v.get("qps_device") or 0)]
        for key in ("best_family", "hnsw_build_seconds", "skipped", "error"):
            if key in e:
                s[key] = e[key]
        scale[n] = s
    if scale:
        c["scale"] = scale
    # hnsw_build_stages / _hierarchy / speedup / elapsed stay in the FULL
    # state only: the compact line must stay small (driver tail capture;
    # the speedup is derivable from hnsw_build_seconds vs 215 s)
    for key in ("hnsw_build_seconds", "ivf_build_seconds",
                "partitioned_hnsw_build_seconds", "partitioned_build_stages",
                "families_euclidean", "ivf_hnsw_modes", "hnsw_ef_curve",
                "latency_ms_device_b1", "batch_scaling"):
        if key in STATE:
            c[key] = STATE[key]
    # size guard: the driver parses the LAST stdout line from a bounded
    # tail (round 3's ~4 KB line overflowed it and parsed null) — shed the
    # optional keys, least-load-bearing first, until the line fits
    for drop in ("hnsw_ef_curve", "batch_scaling", "ivf_hnsw_modes",
                 "partitioned_build_stages", "families_euclidean"):
        if len(json.dumps(c)) <= 2200:
            break
        c.pop(drop, None)
    return c


def emit():
    """Re-derive the headline from everything measured so far, append the
    FULL state to the progress file, and print the COMPACT line (flushed).
    Called after every family / scale size, so the last stdout line is
    always a complete, small, parseable summary."""
    results = STATE["families"]
    eligible = {f: r for f, r in results.items()
                if r.get("recall_at_10", 0) >= RECALL_TARGET
                and r.get("qps_device", 0) > 0}
    pool = eligible or {f: r for f, r in results.items()
                        if r.get("qps_device") is not None}
    if pool:
        best = max(pool, key=lambda f: pool[f]["qps_device"])
        head = results[best]
        qps = head["qps_device"] or head.get("qps_dispatched", 0.0)
        STATE["value"] = round(qps, 1)
        STATE["vs_baseline"] = round(qps / BASELINE_QPS, 2)
        STATE["headline_family"] = best
        STATE["headline_recall_at_10"] = head["recall_at_10"]
    STATE["elapsed_s"] = round(time.perf_counter() - _T0, 1)
    try:
        with open(PROGRESS_PATH, "a") as f:
            f.write(json.dumps(STATE) + "\n")
    except OSError:
        pass
    print(json.dumps(_compact()), flush=True)


def make_corpus(seed=42, n=N, dim=DIM):
    # Realistic mpnet-shaped stand-in: unit-normalized, low-rank, Zipf-skewed
    # topic clusters (export_complete_bible.py:91 normalizes; real text
    # embeddings concentrate near a low-dim manifold). A "centers + full-dim
    # noise" recipe would be near-uniform on the sphere (noise norm
    # ~sqrt(768) x center norm) — unrepresentatively hostile to every
    # partition-based family.
    from hnsw_tpu.io.datagen import generate_vectors
    return generate_vectors(n, dim, distribution="embedding",
                            num_clusters=64, seed=seed)


def make_corpus_device(seed, n, dim, num_clusters=64):
    """Device-side twin of make_corpus's "embedding" recipe for the scale
    sweep: generating 500k x 768 on the 1-core host costs ~118 s and the
    1.5 GB host->device staging another ~90 s through the dev relay
    (round-3 PROGRESS_bench_500k_hnsw.jsonl); on-device generation makes
    corpus staging seconds. Returns (Corpus, host query sample [4096, dim])."""
    import jax
    import jax.numpy as jnp
    from hnsw_tpu.types import LANE, Corpus, round_up

    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(seed), 5)
    r = max(min(dim, 32), dim // 8)
    centers = jax.random.normal(k1, (num_clusters, r), jnp.float32)
    centers /= jnp.maximum(
        jnp.linalg.norm(centers, axis=1, keepdims=True), 1e-12)
    p = jnp.arange(1, num_clusters + 1, dtype=jnp.float32) ** -0.7
    assign = jax.random.choice(k2, num_clusters, (n,), p=p / p.sum())
    resid = jax.random.normal(k3, (n, r), jnp.float32)
    resid /= jnp.maximum(jnp.linalg.norm(resid, axis=1, keepdims=True), 1e-12)
    a = 0.72
    z = a * jnp.take(centers, assign, axis=0) + float(np.sqrt(1 - a * a)) * resid
    proj = jax.random.normal(k4, (r, dim), jnp.float32) / float(np.sqrt(r))
    x = z @ proj + 0.02 * jax.random.normal(k5, (n, dim), jnp.float32)
    x /= jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n_pad = round_up(n, 8)
    d_pad = round_up(dim, LANE)
    vec = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :dim].set(x)
    corpus = Corpus(vectors=vec, sq_norms=jnp.sum(vec * vec, axis=-1),
                    n=n, dim=dim)
    corpus.vectors.block_until_ready()
    sample = np.asarray(jax.device_get(x[:4096]))
    return corpus, sample


def best_mode(idx, data, exact, modes, recall_queries=1024,
              target=RECALL_TARGET, probe_all=False):
    """Cheapest mode meeting the recall bar; falls back to the best seen.
    Returns (mode, recall, {mode: recall} for every mode probed). Stops
    probing further modes when the run budget is exhausted, or (unless
    probe_all) as soon as the bar is met. probe_all keeps probing every
    mode so the family's full recall ladder lands in the artifact (round-4
    weak #3: IVF-HNSW's upper modes were never measured because best_mode
    stopped at balanced); the returned mode is still the cheapest one
    clearing the bar. recall_queries defaults to the perf batch size so
    the recall pass and the perf pass share one compiled program per
    mode."""
    from hnsw_tpu.bench.harness import run_recall_benchmark

    best = None
    chosen = None
    probed = {}
    for mode in modes:
        rec = run_recall_benchmark(idx, data, k=K, mode=mode,
                                   num_queries=recall_queries,
                                   exact_index=exact)
        r = rec["recall_at_k"]
        probed[str(mode)] = round(float(r), 4)
        if best is None or r > best[1]:
            best = (mode, r)
        if r >= target and chosen is None:
            chosen = (mode, r)
            if not probe_all:
                break
        if remaining_s() <= 0:
            break
    mode, r = chosen or best
    return mode, r, probed


def measure_family(name, idx, data, exact, modes, *, batch=1024, iters=10,
                   latency_b1=False, probe_all=False, extra_perf_modes=()):
    """Recall (mode sweep) + throughput for one family; records the result
    in STATE and emits. Any failure is recorded, never fatal.
    latency_b1 additionally measures the device-sustained time of a b=1
    batch of the already-compiled program (the reference's flagship metric
    is 0.186 ms single-query, README.md:27; a per-call synced loop on the
    dev relay would measure only the ~76 ms RTT, so this is the one-batch
    slope instead)."""
    from hnsw_tpu.bench.harness import run_search_benchmark
    try:
        if name == "flat":
            mode, recall, probed = "balanced", 1.0, {"balanced": 1.0}
        elif name.startswith("flat"):
            mode = "balanced"
            from hnsw_tpu.bench.harness import run_recall_benchmark
            rec = run_recall_benchmark(idx, data, k=K, mode=mode,
                                       num_queries=batch, exact_index=exact)
            recall = rec["recall_at_k"]
            probed = {mode: round(float(recall), 4)}
        else:
            mode, recall, probed = best_mode(
                idx, data, exact, modes, target=FAMILY_TARGET.get(
                    name, RECALL_TARGET), probe_all=probe_all)
        perf = run_search_benchmark(idx, data[:batch], k=K, mode=mode,
                                    batch_size=batch, warmup=2, iters=iters,
                                    single_query_iters=0)
        STATE["families"][name] = {
            "mode": str(mode),
            "recall_at_10": round(float(recall), 4),
            "recall_by_mode": probed,
            "qps_device": round(perf.get("qps_device") or 0.0, 1),
            "qps_dispatched": round(perf["qps_batched"], 1),
        }
        # extra_perf_modes: QPS at modes beyond the headline choice, so
        # the family's recall ladder carries costs too (e.g. IVF-HNSW
        # precise — is 0.98 reachable, and at what QPS?)
        for m2 in extra_perf_modes:
            if str(m2) == str(mode) or remaining_s() <= 0:
                continue
            p2 = run_search_benchmark(idx, data[:batch], k=K, mode=m2,
                                      batch_size=batch, warmup=2, iters=6,
                                      single_query_iters=0)
            STATE["families"][name].setdefault("qps_by_mode", {})[str(m2)] \
                = round(p2.get("qps_device") or 0.0, 1)
        if batch != 1024:   # full state only; the compact line stays small
            STATE["families"][name]["batch_size"] = batch
        if latency_b1 and remaining_s() > 0:
            lat = run_search_benchmark(idx, data[:1], k=K, mode=mode,
                                       batch_size=1, warmup=2, iters=4,
                                       single_query_iters=0)
            if lat.get("qps_device"):
                ms = 1e3 / lat["qps_device"]
                STATE["families"][name]["latency_ms_device_b1"] = round(ms, 3)
                STATE.setdefault("latency_ms_device_b1", {})[name] = round(ms, 3)
    except Exception as e:
        STATE["families"][name] = {"error": f"{type(e).__name__}: {e}"}
    emit()


class _EfView:
    """Thin search-time view of an HNSW index pinned to an explicit ef —
    lets the harness measure the ef ladder without touching mode presets.
    Carries qps_scan_safe=False like its target (hop-loop program)."""

    qps_scan_safe = False

    def __init__(self, idx, ef):
        self.idx, self.ef = idx, ef
        self.corpus = idx.corpus

    def search_batch(self, queries, k, mode="balanced"):
        return self.idx.search_batch(queries, k, mode, ef=self.ef)


def batch_scaling(idx, data, *, mode="balanced",
                  batches=(8, 64, 256, 1024, 4096)):
    """QPS vs batch size for one family — the TPU analogue of the
    reference's thread-scaling table (BENCHMARK_SUMMARY.md:24-30: 1t 877 ..
    20t 5,376). Appends [batch, qps_device] rows to STATE."""
    from hnsw_tpu.bench.harness import run_search_benchmark
    rows = []
    qpool = np.asarray(data, np.float32)
    for b in batches:
        if remaining_s() <= 0:
            break
        qb = qpool[: min(b, len(qpool))]
        if len(qb) < b:   # tile the pool up to the batch size
            qb = np.tile(qpool, (b // len(qpool) + 1, 1))[:b]
        try:
            perf = run_search_benchmark(idx, qb, k=K, mode=mode, batch_size=b,
                                        warmup=2, iters=4,
                                        single_query_iters=0)
            rows.append([b, int(perf.get("qps_device") or 0)])
        except Exception:
            rows.append([b, 0])
    STATE["batch_scaling"] = rows
    emit()


def scale_sweep(sizes):
    """Build + measure the best >=0.98-recall family per corpus size — the
    scale story (reference README.md:241-249 size sweep; its 100k row is an
    estimate, ours is measured). Every size is best-effort and emits its
    entry as soon as each family inside it is measured."""
    from hnsw_tpu.bench.harness import measure_build, run_search_benchmark
    from hnsw_tpu.models import build_hnsw_index, build_ivf_flat_index
    from hnsw_tpu.models.flat import FlatIndex
    from hnsw_tpu.types import Corpus

    for n in sizes:
        if remaining_s() <= 0:
            STATE["scale"][str(n)] = {
                "skipped": "bench wall-clock budget exhausted"}
            emit()
            continue
        entry = {"families": {}}
        STATE["scale"][str(n)] = entry
        try:
            t0 = time.perf_counter()
            if n >= 200_000:
                corpus, data = make_corpus_device(7, n, DIM)
            else:
                data = make_corpus(seed=7, n=n, dim=DIM)
                corpus = Corpus.from_array(data)
                corpus.vectors.block_until_ready()
            entry["stage_seconds"] = round(time.perf_counter() - t0, 1)
            exact = FlatIndex(corpus)   # holds no big caches (f32 path
                                        # scores the corpus arrays directly)
            qb = data[:1024]

            def fam(name, idx, modes):
                mode, recall, probed = best_mode(idx, data, exact, modes)
                perf = run_search_benchmark(
                    idx, qb, k=K, mode=mode, batch_size=1024, warmup=2,
                    iters=6, single_query_iters=0)
                entry["families"][name] = {
                    "mode": str(mode),
                    "recall_at_10": round(float(recall), 4),
                    "recall_by_mode": probed,
                    "qps_device": round(perf.get("qps_device") or 0.0, 1),
                    "qps_dispatched": round(perf["qps_batched"], 1),
                }
                fams = entry["families"]
                ok = {f: v for f, v in fams.items()
                      if v.get("recall_at_10", 0) >= RECALL_TARGET
                      and v.get("qps_device", 0) > 0}
                if ok:
                    b = max(ok, key=lambda f: ok[f]["qps_device"])
                    entry["best_family"] = b
                    entry["best_qps_device"] = ok[b]["qps_device"]
                emit()

            # the flat indexes are dropped right after measurement: their
            # padded bf16/int8 device copies (~1.2 GB at 500k) otherwise
            # sit in HBM under the graph build (which OOMed a 500k run)
            fam("flat_bf16_pallas", FlatIndex(corpus, precision="bf16"),
                ["balanced"])
            # int8's 4x byte advantage over f32 (2x over bf16) matters most
            # here, where the scan is HBM-bound (round-3 weak #3); the
            # coarse-only variant shares the instance's cached int8 pack
            i8 = FlatIndex(corpus, precision="int8")
            fam("flat_int8_pallas", i8, ["balanced"])
            i8.int8_fetch = 0
            fam("flat_int8_coarse", i8, ["balanced"])
            del i8
            if remaining_s() > 0 and n <= 1_100_000:
                # 128 partitions at every size: probe coverage is what caps
                # IVF recall at scale (round 3: 12 probes of 707 sqrt(N)
                # clusters = 1.7% coverage capped 500k recall at 0.964),
                # and the build is now fast enough (device-permuted table,
                # host-sampled init, default-precision Lloyd/topc) that
                # fewer/larger slabs cost little. Above 600k the table
                # auto-stores bf16 (the f32 spill slab is 5.9 GB at 1M and
                # HBM-OOMed — round-5 probe r5m; bf16 measured 53.6k QPS @
                # 0.981 at 1M with a 7.4 s build)
                ivf, ivf_s = measure_build(lambda: build_ivf_flat_index(
                    corpus, num_partitions=128, spill=1))
                entry["ivf_build_seconds"] = round(ivf_s, 2)
                fam("ivf_flat", ivf, ["balanced", "accurate", "precise"])
                del ivf
            if remaining_s() > 0 and n <= 1_100_000:
                # at large N: PCA-128 packed hop scoring (full-dim pack is
                # ~24 GB at 500k — exceeds HBM) + a wider bucketed-builder
                # candidate pool for graph quality (round-3's 500k recall
                # capped at 0.927 with the default pool). Past ~600k the
                # bf16 PCA-128 pack outgrows the pack budget too, so
                # HNSWIndex's pack_precision auto drops to int8 codes
                # (4.35 GB at 1M) — that is what extends the graph engine
                # to the 1M row (round-4 missing #2; the builder itself is
                # fully device-resident now, build_large.py)
                kw = dict(M=16, hierarchy=False)   # sampled-entry search
                if n > 150_000:
                    # expand stays 4: e=8 measured slightly SLOWER for the
                    # single-graph search at every scale (scripts/
                    # _probe_r5h/i — multi-entry families are the ones
                    # that want 8)
                    kw.update(pack_dim=128, large_probe_clusters=4,
                              large_refine_rounds=2)
                if n > 600_000:
                    # the 1M ladder is graph-quality bound (probes r5e/f:
                    # scoring precision moves recall < 0.001; one more
                    # NN-descent round + ef=300 reaches 0.987)
                    kw.update(large_refine_rounds=3)
                hnsw, hnsw_s = measure_build(
                    lambda: build_hnsw_index(corpus, **kw))
                if n > 150_000:
                    # wider sampled-entry pool: one [B, S] GEMM either way
                    hnsw.entry_sample = 2048
                entry["hnsw_build_seconds"] = round(hnsw_s, 2)
                fam("hnsw", hnsw,
                    ["turbo", "fast", "balanced", "accurate"])
                del hnsw
        except Exception as e:  # record, keep benching other sizes
            entry["error"] = f"{type(e).__name__}: {e}"
            try:        # OOM forensics: what is still resident, and how big
                import jax
                live = sorted((x.nbytes, str(x.shape), str(x.dtype))
                              for x in jax.live_arrays())[-8:]
                entry["live_arrays_gb"] = round(
                    sum(x.nbytes for x in jax.live_arrays()) / 2**30, 2)
                entry["live_top"] = [f"{s} {d} {b/2**20:.0f}MB"
                                     for b, s, d in live]
            except Exception:
                pass
            emit()
        finally:
            # free this size's device arrays BEFORE the next size allocates:
            # with 1M running before 500k, the lingering 3.1 GB 1M corpus
            # (+ its exact index) pushed the 500k stage into
            # RESOURCE_EXHAUSTED (first round-5 rehearsal run)
            import gc
            exact = corpus = data = qb = None   # drop closure refs too
            gc.collect()


def main():
    from hnsw_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from hnsw_tpu.bench.harness import (measure_build, run_recall_benchmark,
                                        run_search_benchmark)
    from hnsw_tpu.models import (
        build_hnsw_index, build_ivf_flat_index, build_ivf_hnsw_index,
    )
    from hnsw_tpu.models.flat import FlatIndex
    from hnsw_tpu.types import Corpus

    data = make_corpus()
    # pre-stage the corpus on device: the reference's 215 s baseline is the
    # insert loop over already-loaded data, so the (slow dev-relay) 96 MB
    # host->device transfer belongs to data loading, not graph construction
    corpus = Corpus.from_array(data)
    corpus.vectors.block_until_ready()

    # cheapest-compile-first: flat f32 (also the recall ground truth), the
    # Pallas bf16 scan, then IVF, then the hop-loop graph families — so an
    # early kill still captures the most families per compile-second
    exact = FlatIndex(corpus)
    measure_family("flat", exact, data, exact, ["balanced"])

    # the fused Pallas scans are measured at b=4096: the coarse int8 kernel
    # is not yet saturated at b=1024 (batch_scaling: 1.89M @ 1024 vs 2.19M
    # @ 4096 — the per-batch epilogue amortizes); recall is measured over
    # the same 4096 queries
    flat_fast = FlatIndex(corpus, precision="bf16")
    measure_family("flat_bf16_pallas", flat_fast, data, exact, ["balanced"],
                   latency_b1=True, batch=4096)

    # int8 coarse scan + exact f32 re-rank: 2x MXU rate and 1/4 the scan
    # bytes of bf16; the re-rank restores near-exact recall
    # (the re-rank variant stays at b=1024: its scattered-row gather
    # regresses at 4096 — 864k vs 1.07M measured)
    flat_q = FlatIndex(corpus, precision="int8")
    measure_family("flat_int8_pallas", flat_q, data, exact, ["balanced"])
    # coarse-ONLY int8 (no re-rank): the per-row-scale ordering alone holds
    # ~0.99 recall at 31k, at the int8 MXU's full rate — measured 1.62M QPS
    # @ 0.9906 in the same window as bf16's 1.41M (scripts/_probe_r4g.py).
    # This is the headline family, so it also carries the b=1 latency and
    # the batch-scaling (thread-scaling analogue) figures.
    flat_q.int8_fetch = 0
    measure_family("flat_int8_coarse", flat_q, data, exact, ["balanced"],
                   latency_b1=True, batch=4096)

    if remaining_s() > 0:
        # the thread-scaling analogue: QPS vs batch size on the headline
        # kernel (BENCHMARK_SUMMARY.md:24-30)
        batch_scaling(flat_q, data)
    # indexes are dropped as soon as they are measured: the packed-neighbor
    # tables (~1.6 GB each for hnsw/ivf_hnsw/partitioned at 31k) otherwise
    # accumulate in HBM and OOM the 500k scale stage at the end of the run
    del flat_fast, flat_q

    if remaining_s() > 0:
        # sqrt(N)-scale partition count + SOAR spill: the config where the
        # grouped probe scan skips ~90% of the corpus per query at high recall
        ivf, ivf_build_s = measure_build(
            lambda: build_ivf_flat_index(corpus, num_partitions=128, spill=1))
        STATE["ivf_build_seconds"] = round(ivf_build_s, 3)
        measure_family("ivf_flat", ivf, data, exact,
                       ["balanced", "accurate", "precise"], latency_b1=True)
        del ivf

    if remaining_s() > 0:
        stage_t = {}

        def _build(**kw):
            marks = []
            g = build_hnsw_index(
                corpus, M=16,
                progress=lambda s, f: marks.append((s, f, time.perf_counter())),
                **kw)
            # tick timestamps -> per-stage durations (layer0 / upper / repair)
            for (s0, f0, t0), (_, _, t1) in zip(marks, marks[1:]):
                key = ("upper" if s0.startswith("layer") and s0 != "layer0"
                       else s0)
                stage_t[key] = round(stage_t.get(key, 0.0) + (t1 - t0), 3)
            return g

        # the index measured below searches with sampled entries (upper
        # layers unused), so the headline build is the single-layer build
        # of exactly that index; the hierarchical build (entry_mode=
        # "hierarchy" parity) is timed separately
        hnsw, build_cold_s = measure_build(
            lambda: _build(hierarchy=False))
        # warm build = sustained rebuild rate: same kernels, compilation
        # already done (first build includes one-time XLA compilation, which
        # the persistent cache absorbs on subsequent processes)
        stage_t.clear()
        hnsw, build_s = measure_build(lambda: _build(hierarchy=False))
        STATE["hnsw_build_seconds"] = round(build_s, 3)
        STATE["hnsw_build_speedup_vs_215s"] = round(
            BASELINE_BUILD_S / max(build_s, 1e-9), 1)
        STATE["hnsw_build_seconds_cold_incl_compile"] = round(build_cold_s, 3)
        STATE["hnsw_build_stages"] = dict(stage_t)
        if remaining_s() > 0:
            hier_g, build_h = measure_build(lambda: _build(hierarchy=True))
            STATE["hnsw_build_seconds_hierarchy"] = round(build_h, 3)
            del hier_g     # a `_`-bound index would live to process end
        # turbo first: ef=50 already saturates this graph's recall (0.984,
        # scripts/_probe_hop_kernel_r3b.py — identical at ef=50..150) at 2x
        # the QPS of ef=100; best_mode stops at the first mode >= 0.98
        measure_family("hnsw", hnsw, data, exact,
                       ["turbo", "fast", "balanced"], latency_b1=True)
        # the ef<->recall/QPS tradeoff curve on the same graph — the
        # reference documents this ladder (wip/search_config.clj:21-25:
        # ef 10-20 -> 80-85% ... 200 -> 98-99%) but its ef plumbing is
        # inert; here each point is measured
        if remaining_s() > 0:
            curve = []
            for ef in (50, 100, 200, 300, 500):
                if remaining_s() <= 0:
                    break
                v = _EfView(hnsw, ef)
                rec = run_recall_benchmark(v, data, k=K, num_queries=1024,
                                           exact_index=exact)
                perf = run_search_benchmark(v, data[:1024], k=K,
                                            batch_size=1024, warmup=2,
                                            iters=6, single_query_iters=0)
                curve.append([ef, round(float(rec["recall_at_k"]), 3),
                              int(perf.get("qps_device") or 0)])
                STATE["hnsw_ef_curve"] = curve
                emit()
            # the last _EfView otherwise keeps the hnsw index (and its
            # 1.46 GB packed-neighbor table) alive past `del hnsw` — the
            # largest single block in run 3's 500k OOM forensics
            v = None
        # same graph, PCA-256 in-loop scoring + widened exact re-rank
        # (models/hnsw/__init__.py pack_dim): 3x less hop HBM traffic
        from hnsw_tpu.models import HNSWIndex
        hnsw_pca = HNSWIndex(hnsw.corpus, hnsw.graph, pack_dim=256)
        measure_family("hnsw_pca256", hnsw_pca, data, exact,
                       ["turbo", "fast"])
        del hnsw, hnsw_pca

    if remaining_s() > 0:
        try:
            ivfh, ivfh_s = measure_build(
                lambda: build_ivf_hnsw_index(corpus, num_partitions=32))
            STATE["ivf_hnsw_build_seconds"] = round(ivfh_s, 3)
            # probe the FULL mode ladder (round-4 weak #3: the family's
            # ceiling was uncharacterized because best_mode stopped at the
            # 0.85 family bar) and carry precise-mode QPS alongside
            measure_family("ivf_hnsw", ivfh, data, exact,
                           ["balanced", "accurate", "precise"],
                           probe_all=True, extra_perf_modes=["precise"])
            fam = STATE["families"].get("ivf_hnsw", {})
            if "recall_by_mode" in fam:
                STATE["ivf_hnsw_modes"] = {
                    "recall": fam["recall_by_mode"],
                    "qps": dict({fam["mode"]: fam["qps_device"]},
                                **fam.get("qps_by_mode", {}))}
                emit()
            del ivfh
        except Exception as e:
            STATE["families"]["ivf_hnsw"] = {
                "error": f"{type(e).__name__}: {e}"}
            emit()

    # the remaining reference families (README.md:65-106 table parity);
    # measured BEFORE the scale sweep: they are cheap (~3 min total) while
    # the 500k scale row costs ~10 min of build alone, so a budget kill
    # should cost the tail of the scale story, not whole families
    from hnsw_tpu.models import (
        build_lightning_index, build_lsh_index, build_partitioned_hnsw,
        build_pcaf_index,
    )
    # partitioned HNSW gets the same warm-rebuild treatment as the hnsw
    # family plus per-stage ticks: round 4 recorded its ONE cold build —
    # 148.8 s, the round's only loss to the reference (6-7 s, partitioned_
    # hnsw.clj:100-119) — where the cold time was compile + a host-side
    # 96 MB corpus fetch (now a device gather, models/partitioned.py)
    if remaining_s() > 0:
        try:
            pstages = {}

            def _pbuild():
                marks = []
                g = build_partitioned_hnsw(
                    corpus, num_partitions=8,
                    progress=lambda s, f: marks.append(
                        (s, f, time.perf_counter())))
                for (s0, _, t0), (_, _, t1) in zip(marks, marks[1:]):
                    key = s0.split("_l")[0] if "_l" in s0 else s0
                    pstages[key] = round(pstages.get(key, 0.0) + (t1 - t0), 3)
                return g

            pidx, p_cold = measure_build(_pbuild)
            pstages.clear()
            pidx, p_warm = measure_build(_pbuild)
            STATE["partitioned_hnsw_build_seconds"] = round(p_warm, 3)
            STATE["partitioned_hnsw_build_seconds_cold_incl_compile"] = \
                round(p_cold, 3)
            STATE["partitioned_build_stages"] = dict(pstages)
            measure_family("partitioned_hnsw", pidx, data, exact,
                           ["balanced", "accurate", "precise"])
            del pidx
        except Exception as e:
            STATE["families"]["partitioned_hnsw"] = {
                "error": f"{type(e).__name__}: {e}"}
            emit()

    for name, build, modes in [
        ("lightning", lambda: build_lightning_index(
            corpus, partitioning="smart"), ["accurate", "precise"]),
        ("pcaf", lambda: build_pcaf_index(corpus),
         ["balanced", "accurate", "precise"]),
        ("lsh", lambda: build_lsh_index(corpus),
         ["accurate", "precise"]),
    ]:
        if remaining_s() <= 0:
            break
        try:
            idx, b_s = measure_build(build)
            STATE[f"{name}_build_seconds"] = round(b_s, 3)
            measure_family(name, idx, data, exact, modes)
            del idx
        except Exception as e:
            STATE["families"][name] = {"error": f"{type(e).__name__}: {e}"}
            emit()

    if remaining_s() > 0:
        # euclidean parity rows: the reference's own published numbers are
        # euclidean (its README.md:254-265), while every TPU figure so far
        # is cosine. Same vectors, euclidean metric — this records the real
        # cost of the exactness-preserving euclidean policy (the norm
        # formula cancels catastrophically at bf16, so exact paths score at
        # Precision.HIGHEST = 6 MXU passes; models/hnsw/__init__.py "auto")
        # next to the guarded bf16/int8 kernels, whose euclidean keys
        # tolerate the rounding at measured recall.
        try:
            ecorp = Corpus.from_array(data, metric="euclidean")
            ecorp.vectors.block_until_ready()
            eexact = FlatIndex(ecorp)
            efams = {}

            def _emeasure(nm, idx, modes):
                mode, recall, _ = best_mode(idx, data, eexact, modes)
                perf = run_search_benchmark(
                    idx, data[:1024], k=K, mode=mode, batch_size=1024,
                    warmup=2, iters=6, single_query_iters=0)
                efams[nm] = [round(float(recall), 3),
                             int(perf.get("qps_device") or 0)]
                STATE["families_euclidean"] = efams
                emit()

            _emeasure("flat", eexact, ["balanced"])
            _emeasure("flat_bf16_pallas", FlatIndex(ecorp, precision="bf16"),
                      ["balanced"])
            _emeasure("flat_int8_coarse",
                      FlatIndex(ecorp, precision="int8", int8_fetch=0),
                      ["balanced"])
            if remaining_s() > 0:
                ehnsw, eb = measure_build(lambda: build_hnsw_index(
                    ecorp, M=16, hierarchy=False))
                STATE["hnsw_euclidean_build_seconds"] = round(eb, 3)
                _emeasure("hnsw", ehnsw, ["turbo", "fast", "balanced"])
                del ehnsw
            # _emeasure's closure cell would otherwise keep eexact (and the
            # euclidean corpus) alive into the scale sweep
            del _emeasure, eexact, ecorp
        except Exception as e:
            STATE["families_euclidean"] = {
                "error": f"{type(e).__name__}: {e}"}
            emit()

    if SCALE_SIZES and remaining_s() > 0:
        # free every main-phase device array first: the 500k scale stage
        # sits within ~1 GB of HBM capacity (its PCA-128 pack + IVF slab
        # table + corpus), and the lingering 31k corpus/exact/euclidean
        # buffers were exactly the margin that RESOURCE_EXHAUSTED'd it in
        # the first two round-5 full runs (the scale sweep makes its own
        # corpora; a scale-only process ran the same sizes clean)
        import gc
        del exact
        corpus = data = None
        gc.collect()
        scale_sweep(SCALE_SIZES)
    emit()


if __name__ == "__main__":
    sys.exit(main())
