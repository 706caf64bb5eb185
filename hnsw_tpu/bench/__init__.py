"""Benchmark harness: QPS, latency percentiles, recall vs exact, build time —
the TPU form of the reference's bench.clj."""

from hnsw_tpu.bench.harness import (
    latency_report,
    measure_build,
    run_recall_benchmark,
    run_search_benchmark,
)

__all__ = [
    "latency_report",
    "measure_build",
    "run_recall_benchmark",
    "run_search_benchmark",
]
