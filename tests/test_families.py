"""Cross-family tests: every index family builds, searches, hits its
mode-appropriate recall band vs brute force, and round-trips through
to_state/from_state (the reference's integration_test.clj flows)."""

import numpy as np
import pytest

from tests.conftest import brute_force_knn, make_clustered, recall_at_k
from hnsw_tpu.models import FAMILIES, INDEX_CLASSES


DATA = make_clustered(1200, 64, k=10, seed=21)
QUERIES = DATA[:24]
_, EXACT10 = brute_force_knn(DATA, QUERIES, 10, "cosine")

# family -> (build kwargs, precise-mode recall floor)
CASES = {
    "ivf_flat": (dict(num_partitions=12), 0.9),
    "lightning": (dict(num_partitions=12), 0.85),
    "partitioned_hnsw": (dict(num_partitions=4), 0.85),
    "ivf_hnsw": (dict(num_partitions=8), 0.75),
    "hybrid_lsh": (dict(num_bits=6), 0.5),
    "pcaf": (dict(n_components=32), 0.6),
}


@pytest.fixture(scope="module")
def built():
    out = {}
    for fam, (kw, _) in CASES.items():
        out[fam] = FAMILIES[fam](DATA, metric="cosine", **kw)
    return out


@pytest.mark.parametrize("fam", list(CASES))
def test_recall_precise_mode(built, fam):
    floor = CASES[fam][1]
    idx = built[fam]
    _, rows = idx.search_batch(QUERIES, 10, mode="precise")
    r = recall_at_k(np.asarray(rows), EXACT10)
    assert r >= floor, f"{fam}: recall {r} < {floor}"


@pytest.mark.parametrize("fam", list(CASES))
def test_mode_recall_monotone_ish(built, fam):
    idx = built[fam]
    _, r_turbo = idx.search_batch(QUERIES, 10, mode="turbo")
    _, r_precise = idx.search_batch(QUERIES, 10, mode="precise")
    rt = recall_at_k(np.asarray(r_turbo), EXACT10)
    rp = recall_at_k(np.asarray(r_precise), EXACT10)
    assert rp >= rt - 0.05, f"{fam}: precise {rp} < turbo {rt}"


@pytest.mark.parametrize("fam", list(CASES))
def test_results_sorted_and_unique(built, fam):
    idx = built[fam]
    d, rows = idx.search_batch(QUERIES[:4], 10, mode="balanced")
    d, rows = np.asarray(d), np.asarray(rows)
    for qi in range(4):
        real = rows[qi][rows[qi] >= 0]
        assert len(set(real.tolist())) == len(real), f"{fam}: dup rows"
        dd = d[qi][rows[qi] >= 0]
        assert (np.diff(dd) >= -1e-6).all(), f"{fam}: unsorted"


@pytest.mark.parametrize("fam", list(CASES))
def test_state_roundtrip(built, fam):
    idx = built[fam]
    state = idx.to_state()
    idx2 = INDEX_CLASSES[idx.family].from_state(idx.corpus, state)
    _, r1 = idx.search_batch(QUERIES[:4], 5, mode="balanced")
    _, r2 = idx2.search_batch(QUERIES[:4], 5, mode="balanced")
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


@pytest.mark.parametrize("fam", list(CASES))
def test_index_info(built, fam):
    info = built[fam].index_info()
    assert info["num_vectors"] == 1200
    assert info["dimensions"] == 64
    assert info["metric"] == "cosine"


def test_self_query_found_by_partition_families(built):
    # a corpus vector's own partition is always probed in precise mode
    for fam in ("ivf_flat", "partitioned_hnsw", "pcaf"):
        hits = built[fam].search(DATA[100], 1, mode="precise")
        assert hits and hits[0]["distance"] < 1e-3, fam


def test_lsh_overflow_is_accounted():
    """bucket_cap overflow must be disclosed, never silent (the reference
    keeps every vector — hybrid_lsh.clj:113-129 — so any loss here is a
    deviation that must be visible in index_info)."""
    from hnsw_tpu.models.lsh import build_lsh_index
    # tiny cap forces overflow
    idx = build_lsh_index(DATA[:500], num_tables=2, num_bits=2, bucket_cap=8)
    info = idx.index_info()
    assert info["overflow_dropped_slots"] > 0
    expected = 500 * 2 - int(np.asarray((idx.buckets >= 0)).sum())
    assert info["overflow_dropped_slots"] == expected
    # default sizing must lose nothing
    idx2 = build_lsh_index(DATA[:500], num_tables=4, num_bits=4)
    info2 = idx2.index_info()
    assert info2["overflow_rows_unreachable"] == 0


def test_partitioned_empty_partitions_never_return_padding():
    """Regression (ADVICE r1): n < num_partitions leaves empty partitions;
    their entry must stay -1 so the beam never seeds on a padding row and no
    fake id=-1 / padding result reaches the merge."""
    from hnsw_tpu.models.partitioned import build_partitioned_hnsw
    small = DATA[:10]
    idx = build_partitioned_hnsw(small, num_partitions=8, M=4)
    d, r = idx.search_batch(small[:3], 5, mode="precise")
    r = np.asarray(r)
    d = np.asarray(d)
    assert (r[:, 0] == np.arange(3)).all()          # self found first
    assert (r >= 0).all(), r                         # k=5 <= n=10: all real
    assert (d[r >= 0] < 0.999).all()                 # no padding distance 1.0


def test_lsh_margin_flips_beat_fixed_flips():
    """The measured A/B behind models/lsh.py's claim that margin-ordered
    multi-probe flips dominate the reference's query-independent bit flips
    (hybrid_lsh.clj:293-299) at equal probe count: flipping the bits whose
    projection sits closest to the hyperplane first reaches the buckets a
    near-boundary neighbor most likely fell into."""
    import numpy as np

    from hnsw_tpu.models.flat import FlatIndex
    from hnsw_tpu.models.lsh import build_lsh_index
    from tests.conftest import make_clustered, recall_at_k

    data = make_clustered(8000, 128, k=16, seed=51)
    data = (data / np.linalg.norm(data, axis=1, keepdims=True)).astype(
        np.float32)
    idx = build_lsh_index(data)
    exact = FlatIndex(idx.corpus)
    q = data[:256]
    _, er = exact.search_batch(q, 10)
    er = np.asarray(er)
    _, rm = idx.search_batch(q, 10, "accurate", flip_order="margin")
    _, rf = idx.search_batch(q, 10, "accurate", flip_order="fixed")
    rec_m = recall_at_k(np.asarray(rm), er)
    rec_f = recall_at_k(np.asarray(rf), er)
    print(f"lsh flip A/B: margin={rec_m:.4f} fixed={rec_f:.4f}")
    assert rec_m >= rec_f, (rec_m, rec_f)
