"""Unified + simple API tests (the reference's api/unified.clj and
api/simple.clj behaviors)."""

import numpy as np
import pytest

import hnsw_tpu
from tests.conftest import make_unit


DATA = make_unit(300, 32, seed=31)


def test_build_index_dispatch_and_aliases():
    for kind in ("flat", "hnsw", "ultra-fast", ":ivf_flat", "lightning"):
        idx = hnsw_tpu.build_index(DATA, kind, num_partitions=4)
        hits = hnsw_tpu.search_knn(idx, DATA[0], 5)
        assert hits[0]["distance"] < 1e-3


def test_unknown_family_raises():
    with pytest.raises(ValueError, match="unknown index type"):
        hnsw_tpu.build_index(DATA, "nope")


def test_index_type_detection():
    idx = hnsw_tpu.build_index(DATA, "pcaf", n_components=16)
    assert hnsw_tpu.index_type(idx) == "pcaf"
    assert hnsw_tpu.index_info(idx)["type"] == "pcaf"


def test_batch_search():
    idx = hnsw_tpu.build_index(DATA, "hnsw", M=8)
    res = hnsw_tpu.batch_search_knn(idx, DATA[:5], 3)
    assert len(res) == 5
    assert all(len(r) == 3 for r in res)


def test_build_best_for_size():
    # tpu policy: the measured best >=0.98 engine at every single-chip size
    # is the coarse-only int8 flat scan (README "Measured")
    idx = hnsw_tpu.build_best_for_size(DATA)
    assert idx.family == "flat" and idx.precision == "int8"
    assert idx.int8_fetch == 0
    d, r = idx.search_batch(DATA[:4], 3)
    import numpy as np
    assert (np.asarray(r)[:, 0] == np.arange(4)).all()
    # reference policy: simd_wrapper.clj:171-196 sizing table
    idx2 = hnsw_tpu.build_best_for_size(DATA, policy="reference")
    assert idx2.family == "hnsw"   # < 1000 rows


def test_simple_index_lifecycle(tmp_path):
    ix = hnsw_tpu.Index(dimensions=32, distance="cosine", index_type="hnsw",
                        M=8)
    for i in range(100):
        ix.add(f"doc{i}", DATA[i], metadata={"n": i})
    hits = ix.search(DATA[7], 3)
    assert hits[0]["id"] == "doc7"
    assert hits[0]["metadata"] == {"n": 7}
    assert ix.size == 100

    # incremental adds after first build (buffered wave insert)
    for i in range(100, 140):
        ix.add(f"doc{i}", DATA[i])
    hits = ix.search(DATA[120], 1)
    assert hits[0]["id"] == "doc120"
    assert ix.size == 140

    # save / load round-trip with identical ids
    p = str(tmp_path / "simple_idx")
    ix.save(p)
    ix2 = hnsw_tpu.Index.load(p)
    h1 = [h["id"] for h in ix.search(DATA[3], 5)]
    h2 = [h["id"] for h in ix2.search(DATA[3], 5)]
    assert h1 == h2


def test_simple_dim_mismatch():
    ix = hnsw_tpu.Index(dimensions=32)
    with pytest.raises(ValueError):
        ix.add("a", np.zeros(16, np.float32))


def test_simple_empty_search():
    ix = hnsw_tpu.Index(dimensions=8)
    assert ix.search(np.zeros(8, np.float32)) == []


def test_persistence_all_info(tmp_path):
    idx = hnsw_tpu.build_index(DATA, "ivf_flat", num_partitions=4,
                               ids=[f"v{i}" for i in range(300)])
    p = hnsw_tpu.save_index(idx, str(tmp_path / "ivf"))
    assert hnsw_tpu.index_exists(str(tmp_path / "ivf"))
    idx2 = hnsw_tpu.load_index(p)
    assert idx2.family == "ivf_flat"
    assert idx2.corpus.metric == hnsw_tpu.Metric.COSINE
    h1 = hnsw_tpu.search_knn(idx, DATA[9], 5, "precise")
    h2 = hnsw_tpu.search_knn(idx2, DATA[9], 5, "precise")
    assert [x["id"] for x in h1] == [x["id"] for x in h2]
    assert h1[0]["id"] == "v9"


def test_filtered_search():
    idx = hnsw_tpu.build_index(DATA, "flat", ids=[f"v{i}" for i in range(300)])
    hits = hnsw_tpu.filtered_search_knn(
        idx, DATA[0], 5, lambda i: int(i[1:]) >= 100)
    assert all(int(h["id"][1:]) >= 100 for h in hits)


def test_capability_predicates():
    idx = hnsw_tpu.build_index(DATA, "hnsw", M=8)
    from hnsw_tpu.api import supports_batch, supports_filter, \
        supports_persistence
    assert supports_batch(idx) and supports_filter(idx) \
        and supports_persistence(idx)
