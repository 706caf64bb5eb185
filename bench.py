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
(on this corpus size that is the exact flat scan at recall 1.0 — the
TPU-native answer to this workload; HNSW and IVF numbers are reported
alongside). QPS is chip-sustained throughput: batches run inside one
dispatch, excluding this dev environment's ~76 ms relay RTT per call (a real
deployment's colocated-host dispatch overhead is microseconds).

Output protocol: prints one self-contained JSON result line after EVERY
measured family and every scale-sweep size, flush=True — the driver keeps
the tail and the LAST line wins, so a kill at any point past the first
family still captures everything measured so far (round 2 lost its entire
run to a timeout because the only print was at process end). The whole run
is budgeted: work is ordered cheapest-compile-first and each step checks the
remaining wall-clock before starting.
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

# size sweep beyond the reference's published 1k/10k/31k/100k(est) curve
# (reference README.md:241-249); override with HNSW_TPU_SCALE="n1,n2" or
# disable with HNSW_TPU_SCALE="". 500k runs when the budget allows it.
SCALE_SIZES = [int(s) for s in os.environ.get(
    "HNSW_TPU_SCALE", "100000").split(",") if s]

# wall-clock budget for the whole bench run, checked before every family,
# every mode probe, and every scale size: when exhausted, whatever has been
# measured is already on stdout (the driver runs this unattended at round
# end; a size/family already in flight can still overrun by its own
# duration — the budget bounds STARTING new work, not preempting it)
BUDGET_S = float(os.environ.get("HNSW_TPU_BENCH_BUDGET_S", "2100"))
_T0 = time.perf_counter()


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


def emit():
    """Re-derive the headline from everything measured so far and print one
    full JSON line (flushed). Called after every family / scale size."""
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
        STATE["value"] = qps
        STATE["vs_baseline"] = round(qps / BASELINE_QPS, 2)
        STATE["headline_family"] = best
        STATE["headline_recall_at_10"] = head["recall_at_10"]
    STATE["elapsed_s"] = round(time.perf_counter() - _T0, 1)
    print(json.dumps(STATE), flush=True)


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


def best_mode(idx, data, exact, modes, recall_queries=1024):
    """Cheapest mode meeting the recall bar; falls back to the best seen.
    Returns (mode, recall, {mode: recall} for every mode probed). Stops
    probing further modes when the run budget is exhausted. recall_queries
    defaults to the perf batch size so the recall pass and the perf pass
    share one compiled program per mode."""
    from hnsw_tpu.bench.harness import run_recall_benchmark

    best = None
    probed = {}
    for mode in modes:
        rec = run_recall_benchmark(idx, data, k=K, mode=mode,
                                   num_queries=recall_queries,
                                   exact_index=exact)
        r = rec["recall_at_k"]
        probed[str(mode)] = round(float(r), 4)
        if best is None or r > best[1]:
            best = (mode, r)
        if r >= RECALL_TARGET or remaining_s() <= 0:
            break
    return best[0], best[1], probed


def measure_family(name, idx, data, exact, modes, *, batch=1024, iters=10):
    """Recall (mode sweep) + throughput for one family; records the result
    in STATE and emits. Any failure is recorded, never fatal."""
    from hnsw_tpu.bench.harness import run_search_benchmark
    try:
        if name == "flat":
            mode, recall, probed = "balanced", 1.0, {"balanced": 1.0}
        else:
            mode, recall, probed = best_mode(idx, data, exact, modes)
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
    except Exception as e:
        STATE["families"][name] = {"error": f"{type(e).__name__}: {e}"}
    emit()


def scale_sweep(sizes):
    """Build + measure the best >=0.98-recall family per corpus size — the
    scale story (reference README.md:241-249 size sweep; its 100k row is an
    estimate, ours is measured). Every size is best-effort and emits its
    entry as soon as each family inside it is measured."""
    from hnsw_tpu.bench.harness import (
        measure_build, run_recall_benchmark, run_search_benchmark,
    )
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
            data = make_corpus(seed=7, n=n, dim=DIM)
            corpus = Corpus.from_array(data)
            corpus.vectors.block_until_ready()
            entry["stage_seconds"] = round(time.perf_counter() - t0, 1)
            exact = FlatIndex(corpus)
            flat_fast = FlatIndex(corpus, precision="bf16")
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

            fam("flat_bf16_pallas", flat_fast, ["balanced"])
            if remaining_s() > 0:
                ivf, ivf_s = measure_build(lambda: build_ivf_flat_index(
                    corpus, num_partitions=max(64, int(n ** 0.5)), spill=1))
                entry["ivf_build_seconds"] = round(ivf_s, 2)
                fam("ivf_flat", ivf, ["balanced", "accurate", "precise"])
                del ivf
            if remaining_s() > 0:
                hnsw, hnsw_s = measure_build(
                    lambda: build_hnsw_index(corpus, M=16))
                entry["hnsw_build_seconds"] = round(hnsw_s, 2)
                fam("hnsw", hnsw, ["turbo", "fast", "balanced"])
                del hnsw
        except Exception as e:  # record, keep benching other sizes
            entry["error"] = f"{type(e).__name__}: {e}"
            emit()


def main():
    from hnsw_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from hnsw_tpu.bench.harness import measure_build
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

    flat_fast = FlatIndex(corpus, precision="bf16")
    measure_family("flat_bf16_pallas", flat_fast, data, exact, ["balanced"])

    # int8 coarse scan + exact f32 re-rank: 2x MXU rate and 1/4 the scan
    # bytes of bf16; the re-rank restores near-exact recall
    flat_q = FlatIndex(corpus, precision="int8")
    measure_family("flat_int8_pallas", flat_q, data, exact, ["balanced"])

    if remaining_s() > 0:
        # sqrt(N)-scale partition count + SOAR spill: the config where the
        # grouped probe scan skips ~90% of the corpus per query at high recall
        ivf, ivf_build_s = measure_build(
            lambda: build_ivf_flat_index(corpus, num_partitions=128, spill=1))
        STATE["ivf_build_seconds"] = round(ivf_build_s, 3)
        measure_family("ivf_flat", ivf, data, exact,
                       ["balanced", "accurate", "precise"])

    if remaining_s() > 0:
        hnsw, build_cold_s = measure_build(
            lambda: build_hnsw_index(corpus, M=16))
        # warm build = sustained rebuild rate: same kernels, compilation
        # already done (first build includes one-time XLA compilation, which
        # the persistent cache absorbs on subsequent processes)
        _, build_s = measure_build(lambda: build_hnsw_index(corpus, M=16))
        STATE["hnsw_build_seconds"] = round(build_s, 3)
        STATE["hnsw_build_speedup_vs_215s"] = round(
            BASELINE_BUILD_S / max(build_s, 1e-9), 1)
        STATE["hnsw_build_seconds_cold_incl_compile"] = round(build_cold_s, 3)
        # turbo first: ef=50 already saturates this graph's recall (0.984,
        # scripts/_probe_hop_kernel_r3b.py — identical at ef=50..150) at 2x
        # the QPS of ef=100; best_mode stops at the first mode >= 0.98
        measure_family("hnsw", hnsw, data, exact,
                       ["turbo", "fast", "balanced"])
        # same graph, PCA-256 in-loop scoring + widened exact re-rank
        # (models/hnsw/__init__.py pack_dim): 3x less hop HBM traffic
        from hnsw_tpu.models import HNSWIndex
        hnsw_pca = HNSWIndex(hnsw.corpus, hnsw.graph, pack_dim=256)
        measure_family("hnsw_pca256", hnsw_pca, data, exact,
                       ["turbo", "fast"])

    if remaining_s() > 0:
        try:
            ivfh, ivfh_s = measure_build(
                lambda: build_ivf_hnsw_index(corpus, num_partitions=32))
            STATE["ivf_hnsw_build_seconds"] = round(ivfh_s, 3)
            measure_family("ivf_hnsw", ivfh, data, exact,
                           ["balanced", "accurate", "precise"])
        except Exception as e:
            STATE["families"]["ivf_hnsw"] = {
                "error": f"{type(e).__name__}: {e}"}
            emit()

    if SCALE_SIZES and remaining_s() > 0:
        scale_sweep(SCALE_SIZES)

    # the remaining reference families (README.md:65-106 table parity);
    # measured last — the headline and scale story above matter more, so a
    # budget kill costs these first
    from hnsw_tpu.models import (
        build_lightning_index, build_lsh_index, build_partitioned_hnsw,
        build_pcaf_index,
    )
    for name, build, modes in [
        ("partitioned_hnsw", lambda: build_partitioned_hnsw(
            corpus, num_partitions=8), ["balanced", "accurate", "precise"]),
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
    emit()


if __name__ == "__main__":
    sys.exit(main())
