"""Harness + aux subsystem tests: latency report format, recall benchmark,
warmup, interruptible build, timeout fallback, timing utils."""

import numpy as np
import pytest

from tests.conftest import make_unit
from hnsw_tpu.bench.harness import (
    build_with_timeout, latency_report, measure_build, run_recall_benchmark,
    run_search_benchmark, warmup,
)
from hnsw_tpu.models import build_flat_index, build_lightning_index
from hnsw_tpu.models.hnsw import build_hnsw_index
from hnsw_tpu.models.hnsw.build import BuildInterrupted, build_graph
from hnsw_tpu.types import Corpus
from hnsw_tpu.utils.timing import Timer, timed


DATA = make_unit(400, 32, seed=51)


def test_latency_report_fields():
    rep = latency_report([1.0, 2.0, 3.0, 4.0, 100.0])
    assert rep["min_ms"] == 1.0 and rep["max_ms"] == 100.0
    assert rep["p50_ms"] <= rep["p95_ms"] <= rep["p99_ms"]
    assert set(rep) == {"min_ms", "p50_ms", "p95_ms", "p99_ms", "max_ms",
                        "avg_ms"}


def test_search_benchmark_shape():
    idx = build_flat_index(DATA)
    rep = run_search_benchmark(idx, DATA[:64], k=5, batch_size=32, iters=3,
                               single_query_iters=3)
    assert rep["qps_batched"] > 0
    assert rep["batch_size"] == 32
    assert rep["k"] == 5 and rep["mode"] == "balanced"


def test_recall_benchmark_exact_is_one():
    idx = build_flat_index(DATA)
    rec = run_recall_benchmark(idx, DATA, k=5, num_queries=20)
    assert rec["recall_at_k"] == 1.0


def test_measure_build_and_warmup():
    idx, secs = measure_build(lambda: build_lightning_index(DATA,
                                                            num_partitions=4))
    assert secs >= 0
    warmup(idx)


def test_interruptible_build():
    c = Corpus.from_array(DATA)
    calls = []
    with pytest.raises(BuildInterrupted):
        build_graph(c, m=8, should_continue=lambda: len(calls) < 1 and
                    (calls.append(1) or False))


def test_build_progress_reported():
    c = Corpus.from_array(DATA)
    stages = []
    build_graph(c, m=8, progress=lambda s, f: stages.append((s, f)))
    assert any(s.startswith("layer0") for s, _ in stages)


def test_build_with_timeout_fallback():
    import time

    def slow():
        time.sleep(5)
        return "never"

    idx, used_fb = build_with_timeout(
        slow, 0.2, lambda: build_lightning_index(DATA, num_partitions=4))
    assert used_fb and idx.family == "lightning"

    idx2, used_fb2 = build_with_timeout(
        lambda: build_flat_index(DATA), 30.0)
    assert not used_fb2 and idx2.family == "flat"


def test_timer_utils():
    t = Timer()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    out = []
    with timed("x", out):
        pass
    assert out[0][0] == "x"


def test_cache_scrub_removes_corrupt_entries(tmp_path):
    """A killed process can truncate a compile-cache write; the scrub must
    drop exactly the corrupt entries (BENCH_r01 showed a ZstdError poisoning
    'jit_scanned' reads across processes)."""
    import zstandard as zstd
    from hnsw_tpu.utils.cache import scrub_compilation_cache

    good = tmp_path / "jit_good-cache"
    good.write_bytes(zstd.ZstdCompressor().compress(b"hello" * 100))
    bad = tmp_path / "jit_bad-cache"
    bad.write_bytes(b"\x28\xb5\x2f\xfd" + b"\x00" * 32)  # truncated frame
    removed = scrub_compilation_cache(str(tmp_path))
    assert removed == 1
    assert good.exists() and not bad.exists()
