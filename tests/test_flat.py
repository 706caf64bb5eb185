"""Flat/exact index tests: recall == 1.0 vs host brute force, edge cases
from the reference's suite (empty index -> empty results, single vector,
k > n returns n; core_test.clj:63-96), streaming-tile equivalence."""

import numpy as np
import pytest

from tests.conftest import brute_force_knn, make_unit, recall_at_k
from hnsw_tpu.models.flat import FlatIndex, build_flat_index, exact_topk
from hnsw_tpu.types import Corpus, Metric


def test_exact_matches_bruteforce(unit_vecs_small):
    data = unit_vecs_small
    idx = build_flat_index(data, metric="cosine")
    q = data[:8]
    d, r = idx.search_batch(q, 10)
    _, exact = brute_force_knn(data, q, 10, "cosine")
    assert recall_at_k(np.asarray(r), exact) == 1.0


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot"])
def test_metrics(metric):
    data = make_unit(128, 48, seed=7)
    idx = build_flat_index(data, metric=metric)
    q = data[3:5]
    d, r = idx.search_batch(q, 5)
    _, exact = brute_force_knn(data, q, 5, metric)
    assert recall_at_k(np.asarray(r), exact) == 1.0
    # self should be the nearest hit for cosine/euclidean
    if metric != "dot":
        assert int(np.asarray(r)[0, 0]) == 3


def test_k_greater_than_n():
    data = make_unit(5, 16)
    idx = build_flat_index(data)
    d, r = idx.search_batch(data[:1], 10)
    r = np.asarray(r)[0]
    assert (r >= 0).sum() == 5                # n results
    assert set(r[5:]) == {-1}


def test_single_vector():
    data = make_unit(1, 16)
    idx = build_flat_index(data)
    hits = idx.search(data[0], 3)
    assert len(hits) == 1
    assert hits[0]["distance"] < 1e-4


def test_streaming_tiles_match_single_shot():
    data = make_unit(300, 32, seed=9)
    c = Corpus.from_array(data, metric="cosine")
    q = c.pad_queries(data[:4])
    d1, r1 = exact_topk(c.vectors, c.sq_norms, q, k=7, n=c.n,
                        metric=Metric.COSINE, tile=1 << 20)
    d2, r2 = exact_topk(c.vectors, c.sq_norms, q, k=7, n=c.n,
                        metric=Metric.COSINE, tile=64)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)


def test_external_ids_and_result_shape():
    data = make_unit(20, 16)
    ids = [f"vec_{i}" for i in range(20)]
    idx = build_flat_index(data, ids=ids)
    hits = idx.search(data[7], 3)
    assert hits[0]["id"] == "vec_7"
    assert hits == sorted(hits, key=lambda h: h["distance"])


def test_reference_pair_format():
    data = make_unit(10, 16)
    pairs = [[f"id{i}", data[i]] for i in range(10)]
    idx = build_flat_index(pairs)
    hits = idx.search(data[2], 1)
    assert hits[0]["id"] == "id2"


def test_filtered_search_overfetch():
    data = make_unit(100, 16)
    ids = [f"vec_{i}" for i in range(100)]
    idx = build_flat_index(data, ids=ids)
    hits = idx.search_filtered(data[0], 5,
                               lambda i: int(i.split("_")[1]) % 2 == 0)
    assert len(hits) <= 5
    assert all(int(h["id"].split("_")[1]) % 2 == 0 for h in hits)


def test_int8_quantized_path():
    # int8 coarse pass + exact re-rank: near-exact recall
    data = make_unit(500, 64, seed=23)
    from hnsw_tpu.models.flat import FlatIndex
    from hnsw_tpu.types import Corpus
    c = Corpus.from_array(data)
    exact = FlatIndex(c)
    q8 = FlatIndex(c, precision="int8")
    q = data[:32]
    _, re = exact.search_batch(q, 10)
    _, r8 = q8.search_batch(q, 10)
    assert recall_at_k(np.asarray(r8), np.asarray(re)) >= 0.97
    # distances of the int8 path are exact (re-ranked)
    d8, rr = q8.search_batch(q, 10)
    de, _ = exact.search_batch(q, 10)
    np.testing.assert_allclose(np.asarray(d8)[:, 0], np.asarray(de)[:, 0],
                               atol=1e-4)


def test_native_filtered_search_exact():
    # predicate becomes a pre-top-k row mask: exact filtering even when the
    # matching set is tiny (over-fetch would miss)
    data = make_unit(300, 32, seed=29)
    ids = [f"vec_{i}" for i in range(300)]
    idx = build_flat_index(data, ids=ids)
    hits = idx.search_filtered(data[0], 5, lambda i: int(i.split("_")[1]) >= 295)
    got = sorted(int(h["id"].split("_")[1]) for h in hits)
    assert len(hits) == 5 and all(g >= 295 for g in got)


def test_int8_coarse_only_option():
    """int8_fetch=0 (coarse-only, no re-rank) stays a correct engine on
    every backend: valid ascending results, near-exact recall, and the
    option round-trips through persistence (models/flat.py _int8_pallas;
    on CPU the path takes the int8_topk fallback)."""
    data = make_unit(500, 64, seed=29)
    from hnsw_tpu.io.persist import load_index, save_index
    from hnsw_tpu.models.flat import FlatIndex
    from hnsw_tpu.types import Corpus
    c = Corpus.from_array(data)
    exact = FlatIndex(c)
    coarse = FlatIndex(c, precision="int8", int8_fetch=0)
    q = data[:32]
    _, re = exact.search_batch(q, 10)
    d0, r0 = coarse.search_batch(q, 10)
    assert recall_at_k(np.asarray(r0), np.asarray(re)) >= 0.97
    d0 = np.asarray(d0)
    assert (np.diff(d0, axis=1) >= -1e-6).all()
    assert (np.asarray(r0) >= 0).all() and (np.asarray(r0) < 500).all()
    # self-match first
    assert (np.asarray(r0)[:, 0] == np.arange(32)).all()
    # persistence keeps the coarse-only setting distinct from auto (None)
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "coarse_idx")
        save_index(coarse, p)
        back = load_index(p)
    assert back.int8_fetch == 0 and back.precision == "int8"
