"""Performance-tagged gates — the analogue of the reference's
benchmark_test.clj: build-time and latency ceilings, sub-linear search
scaling, memory accounting. Marked `perf`; kept loose enough for the CPU
test backend (real numbers come from bench.py on TPU)."""

import time

import numpy as np
import pytest

from tests.conftest import make_unit
from hnsw_tpu.bench.harness import measure_build
from hnsw_tpu.models import build_flat_index
from hnsw_tpu.models.hnsw import build_hnsw_index

pytestmark = pytest.mark.perf


def test_build_time_gate():
    # reference gate: 384-dim build < 20 s for 1k (benchmark_test.clj:97-118)
    data = make_unit(1000, 384, seed=61)
    _, secs = measure_build(lambda: build_hnsw_index(data, M=8))
    assert secs < 120, f"1k x 384 build took {secs:.1f}s"


def test_sublinear_search_scaling():
    # search-time ratio should grow slower than corpus-size ratio
    # (benchmark_test.clj:144-184) — flat scan is linear in N but the
    # per-batch fixed cost keeps the measured ratio below size ratio
    times = {}
    for n in (512, 2048):
        data = make_unit(n, 64, seed=62)
        idx = build_flat_index(data)
        q = data[:32]
        idx.search_batch(q, 10)  # warm
        t0 = time.perf_counter()
        for _ in range(3):
            d, _ = idx.search_batch(q, 10)
        d.block_until_ready()
        times[n] = time.perf_counter() - t0
    assert times[2048] / times[512] < 4.0 * 2


def test_memory_accounting():
    # index_info must report a sane memory estimate (benchmark_test.clj
    # memory budget test, :251-288)
    data = make_unit(1000, 128, seed=63)
    idx = build_flat_index(data)
    mb = idx.index_info()["memory_mb"]
    expected = 1000 * 128 * 4 / 1e6
    assert expected * 0.5 < mb < expected * 4


def test_dimension_sweep():
    # cross-dimension correctness, 384 -> 1536 (integration_test.clj:91-118)
    for dim in (384, 1536):
        data = make_unit(200, dim, seed=64)
        idx = build_hnsw_index(data, M=8)
        hits = idx.search(data[5], 3)
        assert hits[0]["distance"] < 1e-3
