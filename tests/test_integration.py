"""Cross-layer integration tests mirroring the reference's
integration_test.clj: cross-family comparisons, concurrent search during an
index swap (:159-181), determinism with fixed seeds, mode preset tables."""

import threading

import numpy as np
import pytest

import hnsw_tpu
from tests.conftest import brute_force_knn, make_unit, recall_at_k
from hnsw_tpu.config import (
    HNSW_EF, IVF_FLAT_PROBES, IVF_HNSW_MODES, LSH_MODES, Mode, PCAF_KFILTER,
    adaptive_k_per_partition, lightning_percent,
)


DATA = make_unit(500, 48, seed=81)


def test_lightning_vs_hnsw_comparison():
    # lightning (precise) and hnsw should broadly agree (integration_test
    # compares lightning vs ultra results)
    h = hnsw_tpu.build_index(DATA, "hnsw", M=8)
    l = hnsw_tpu.build_index(DATA, "lightning", num_partitions=8)
    q = DATA[:16]
    _, exact = brute_force_knn(DATA, q, 10, "cosine")
    _, rh = h.search_batch(q, 10, "balanced")
    _, rl = l.search_batch(q, 10, "precise")
    assert recall_at_k(np.asarray(rh), exact) >= 0.9
    assert recall_at_k(np.asarray(rl), exact) >= 0.9


def test_concurrent_search_during_swap():
    # searches from many threads while the index reference is swapped
    # (integration_test.clj:159-181)
    holder = {"idx": hnsw_tpu.build_index(DATA[:300], "flat")}
    errors = []

    def searcher():
        try:
            for _ in range(5):
                hits = holder["idx"].search(DATA[0], 5)
                assert hits and hits[0]["distance"] < 1.5
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=searcher) for _ in range(4)]
    for t in threads:
        t.start()
    holder["idx"] = hnsw_tpu.build_index(DATA, "flat")   # swap mid-flight
    for t in threads:
        t.join()
    assert not errors


def test_build_determinism():
    # fixed seeds => identical graphs (levels, k-means init, projections are
    # all seeded in the reference: graph.clj:71, ivf_flat.clj:37, pcaf.clj:37)
    a = hnsw_tpu.build_index(DATA, "hnsw", M=8, seed=42)
    b = hnsw_tpu.build_index(DATA, "hnsw", M=8, seed=42)
    np.testing.assert_array_equal(np.asarray(a.graph.adj0),
                                  np.asarray(b.graph.adj0))
    p1 = hnsw_tpu.build_index(DATA, "pcaf", n_components=16, seed=7)
    p2 = hnsw_tpu.build_index(DATA, "pcaf", n_components=16, seed=7)
    np.testing.assert_array_equal(np.asarray(p1.proj), np.asarray(p2.proj))


def test_mode_preset_values_match_reference():
    # the exact knob tables (SURVEY.md §5 config)
    assert HNSW_EF[Mode.TURBO] == 50 and HNSW_EF[Mode.PRECISE] == 500
    assert IVF_FLAT_PROBES[Mode.TURBO] == 1
    assert IVF_FLAT_PROBES[Mode.PRECISE] == 12
    assert IVF_HNSW_MODES[Mode.TURBO] == (1, 50)
    assert IVF_HNSW_MODES[Mode.PRECISE] == (5, 300)
    assert LSH_MODES[Mode.TURBO] == (2, 1)
    assert LSH_MODES[Mode.PRECISE] == (8, 4)
    assert PCAF_KFILTER[Mode.BALANCED] == 32
    # adaptive k-per-partition bands (partitioned_hnsw.clj:158-162)
    assert adaptive_k_per_partition(8, 10) == 3
    assert adaptive_k_per_partition(16, 10) == 2
    assert adaptive_k_per_partition(64, 10) == 1
    # partition-count bands for lightning percent (lightning.clj:198-229)
    assert lightning_percent("precise", 24) == 0.75
    assert lightning_percent(Mode.TURBO, 64) == 0.05


def test_mode_aliases_and_keywords():
    idx = hnsw_tpu.build_index(DATA[:100], "flat")
    for m in (":balanced", "BALANCED", Mode.BALANCED, "turbo"):
        assert len(idx.search(DATA[0], 3, m)) == 3


def test_metric_recorded_in_persistence(tmp_path):
    idx = hnsw_tpu.build_index(DATA, "hnsw", M=8, metric="euclidean")
    p = hnsw_tpu.save_index(idx, str(tmp_path / "e"))
    idx2 = hnsw_tpu.load_index(p)
    assert idx2.corpus.metric == hnsw_tpu.Metric.EUCLIDEAN
