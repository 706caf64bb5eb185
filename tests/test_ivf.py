"""IVF-FLAT quality and search-path tests: balanced assignment, SOAR-style
spill, and the compute-skipping grouped probe scan (the reference's recall
band is 95%+ at 4-8 probes — README.md:83, ivf_flat.clj:243-247)."""

import numpy as np
import pytest

from tests.conftest import brute_force_knn, recall_at_k
from hnsw_tpu.io.datagen import generate_vectors
from hnsw_tpu.models.ivf_flat import IVFFlatIndex, build_ivf_flat_index


DATA = generate_vectors(4000, 128, distribution="embedding",
                        num_clusters=24, seed=9)
QUERIES = DATA[:100]
_, EXACT = brute_force_knn(DATA, QUERIES, 10, "cosine")


@pytest.fixture(scope="module")
def spilled():
    return build_ivf_flat_index(DATA, num_partitions=24, spill=1)


def test_balanced_assignment_caps_cluster_size():
    idx = build_ivf_flat_index(DATA, num_partitions=16, balance=1.25)
    sizes = idx.table.partition_sizes()
    cap = int(np.ceil(1.25 * len(DATA) / 16))
    assert sizes.max() <= cap, (sizes.max(), cap)
    assert sizes.sum() == len(DATA)


def test_reference_recall_band(spilled):
    """>= 0.95 recall@10 at <= 8 probes (the reference's band)."""
    _, rows = spilled.search_batch(QUERIES, 10, num_probes=4)
    r4 = recall_at_k(np.asarray(rows), EXACT)
    _, rows = spilled.search_batch(QUERIES, 10, num_probes=8)
    r8 = recall_at_k(np.asarray(rows), EXACT)
    assert r4 >= 0.95, r4
    assert r8 >= 0.97, r8


def test_spill_improves_recall_at_low_probes():
    plain = build_ivf_flat_index(DATA, num_partitions=24, spill=0)
    sp = build_ivf_flat_index(DATA, num_partitions=24, spill=1)
    _, rp = plain.search_batch(QUERIES, 10, num_probes=1)
    _, rs = sp.search_batch(QUERIES, 10, num_probes=1)
    r_plain = recall_at_k(np.asarray(rp), EXACT)
    r_spill = recall_at_k(np.asarray(rs), EXACT)
    assert r_spill > r_plain + 0.03, (r_plain, r_spill)


def test_no_duplicate_rows_with_spill(spilled):
    for scan in ("full", "grouped"):
        _, rows = spilled.search_batch(QUERIES, 10, num_probes=8, scan=scan)
        for row in np.asarray(rows):
            v = row[row >= 0]
            assert len(set(v.tolist())) == len(v), (scan, row)


def test_grouped_matches_full_scan(spilled):
    """The grouped path must find (essentially) the same neighbors as the
    masked full scan — same probes, same table; only bf16 scoring ties can
    differ."""
    _, rf = spilled.search_batch(QUERIES, 10, num_probes=8, scan="full")
    _, rg = spilled.search_batch(QUERIES, 10, num_probes=8, scan="grouped")
    agree = np.mean([
        len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist())) / 10
        for a, b in zip(np.asarray(rf), np.asarray(rg))])
    assert agree >= 0.97, agree
    assert spilled.index_info()["last_grouped_dropped_pairs"] == 0


def test_grouped_drop_accounting():
    """A tiny qcap must shed pairs and report them (no silent caps)."""
    from hnsw_tpu.models._partition_scan import grouped_search
    from hnsw_tpu.models._partition_scan import probe_mask_from_centroids
    idx = build_ivf_flat_index(DATA, num_partitions=24, spill=0)
    t = idx.table
    q = idx.corpus.pad_queries(QUERIES)
    _, probe_ids = probe_mask_from_centroids(q, t.centroids, num_probes=8,
                                             metric=idx.corpus.metric)
    d, r, dropped = grouped_search(
        t.vectors, t.v_sq, t.perm, t.starts, t.lens, probe_ids, q,
        k=10, cmax=t.cmax, qcap=8, metric=idx.corpus.metric)
    assert int(dropped) > 0
    # degradation is graceful: most self-queries still find themselves (the
    # rank-ordered shedding keeps nearest probes unless a popular cluster is
    # rank-0 for more than qcap queries)
    assert (np.asarray(r)[:, 0] == np.arange(len(QUERIES))).mean() >= 0.75


def test_state_roundtrip_with_spill(spilled):
    state = spilled.to_state()
    idx2 = IVFFlatIndex.from_state(spilled.corpus, state)
    _, r1 = spilled.search_batch(QUERIES[:16], 10, num_probes=4)
    _, r2 = idx2.search_batch(QUERIES[:16], 10, num_probes=4)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert idx2.spill == 1


def test_bf16_slab_table_matches_f32():
    """bf16 slab storage (the 1M-rows-on-one-chip memory option) must match
    the f32 table's results for cosine within bf16 rounding, and the dtype
    must survive a persistence round-trip."""
    import jax.numpy as jnp
    import numpy as np

    from hnsw_tpu.io.persist import load_index, save_index
    from hnsw_tpu.models.ivf_flat import build_ivf_flat_index
    from tests.conftest import make_clustered, recall_at_k

    data = make_clustered(3000, 64, k=12, seed=61)
    data = (data / np.linalg.norm(data, axis=1, keepdims=True)).astype(
        np.float32)
    f32 = build_ivf_flat_index(data, num_partitions=24, spill=1)
    bf = build_ivf_flat_index(data, num_partitions=24, spill=1,
                              table_dtype="bf16")
    assert bf.table.vectors.dtype == jnp.bfloat16
    assert f32.table.vectors.dtype == jnp.float32
    # this clustered corpus is tie-dense (250 near-duplicates per cluster),
    # so bf16 scoring legitimately reorders near-ties vs a HIGHEST-precision
    # scan. The property to assert is that the bf16 TABLE adds nothing
    # beyond bf16 SCORING: compare against a bf16-precision flat scan of
    # the whole corpus (the same rounding family).
    from hnsw_tpu.models.flat import FlatIndex
    q = data[:128]
    _, rbf_ref = FlatIndex(f32.corpus, precision="bf16").search_batch(q, 10)
    rbf_ref = np.asarray(rbf_ref)
    _, rb = bf.search_batch(q, 10, "accurate")
    rec_b = recall_at_k(np.asarray(rb), rbf_ref)
    assert rec_b >= 0.95, rec_b
    # full-scan path too (masked scan_search)
    _, rb2 = bf.search_batch(q, 10, "accurate", scan="full")
    assert recall_at_k(np.asarray(rb2), rbf_ref) >= 0.95
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        pth = os.path.join(td, "ivf_bf16")
        save_index(bf, pth)
        back = load_index(pth)
    assert back.table.vectors.dtype == jnp.bfloat16
    _, rb3 = back.search_batch(q, 10, "accurate")
    assert recall_at_k(np.asarray(rb3), rbf_ref) >= 0.95
