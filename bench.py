#!/usr/bin/env python
"""Headline benchmark: HNSW QPS at recall@10 >= 0.98 on a Bible-shaped corpus
(31,173 x 768, unit-normalized — the reference's dataset shape; the real
corpus JSON is not distributed with the reference repo, so a seeded
mpnet-shaped clustered synthetic stands in). Baseline: the reference's best
published number, 5,376 QPS at 20 threads with ~0.99 recall and a 215 s
index build (reference README.md:27, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

N = 31173           # Bible verse count (reference README.md:22)
DIM = 768           # mpnet-v2 embedding dim
K = 10
RECALL_TARGET = 0.98
BASELINE_QPS = 5376.0   # reference 20-thread peak (README.md:27)


def make_corpus(seed=42):
    rng = np.random.default_rng(seed)
    # clustered unit vectors: Bible embeddings are normalized and strongly
    # clustered by book/topic (export_complete_bible.py:91 normalizes)
    k = 64
    centers = rng.standard_normal((k, DIM)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, k, N)
    x = centers[assign] + 0.35 * rng.standard_normal((N, DIM)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def main():
    from hnsw_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from hnsw_tpu.bench.harness import (
        measure_build, run_recall_benchmark, run_search_benchmark,
    )
    from hnsw_tpu.models import build_hnsw_index
    from hnsw_tpu.models.flat import FlatIndex

    data = make_corpus()
    idx, build_s = measure_build(lambda: build_hnsw_index(data, M=16))
    exact = FlatIndex(idx.corpus)

    # find the cheapest mode meeting the recall bar, then report its QPS
    chosen = None
    for mode in ("turbo", "fast", "balanced", "accurate", "precise"):
        rec = run_recall_benchmark(idx, data, k=K, mode=mode,
                                   num_queries=256, exact_index=exact)
        if rec["recall_at_k"] >= RECALL_TARGET:
            chosen = (mode, rec["recall_at_k"])
            break
    if chosen is None:
        chosen = ("precise", rec["recall_at_k"])

    mode, recall = chosen
    perf = run_search_benchmark(idx, data[:4096], k=K, mode=mode,
                                batch_size=1024, warmup=3, iters=10)
    # qps_device = chip-sustained throughput (batches scanned inside one
    # dispatch); qps_batched additionally pays per-dispatch host overhead,
    # which in this dev environment is a ~76 ms relay RTT per call
    qps = perf.get("qps_device") or perf["qps_batched"]

    print(json.dumps({
        "metric": f"hnsw_qps_at_recall@10>={RECALL_TARGET}_31k x768".replace(" ", ""),
        "value": round(qps, 1),
        "unit": "qps/chip",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
        "recall_at_10": round(recall, 4),
        "mode": mode,
        "build_seconds": round(build_s, 3),
        "build_vs_baseline_215s": round(215.0 / max(build_s, 1e-9), 1),
        "single_query_p50_ms": perf.get("p50_ms"),
    }))


if __name__ == "__main__":
    sys.exit(main())
