"""HNSW family tests: recall vs brute force (the reference's core
correctness metric, integration_test.clj:138-157), ef monotonicity, edge
cases, incremental wave insert."""

import numpy as np
import pytest

from tests.conftest import brute_force_knn, make_clustered, make_unit, recall_at_k
from hnsw_tpu.models.hnsw import HNSWIndex, build_hnsw_index


@pytest.fixture(scope="module")
def built():
    data = make_unit(1000, 64, seed=3)
    idx = build_hnsw_index(data, M=16, metric="cosine")
    return data, idx


def test_recall_balanced(built):
    data, idx = built
    q = data[:32]
    _, exact = brute_force_knn(data, q, 10, "cosine")
    _, rows = idx.search_batch(q, 10)
    r = recall_at_k(np.asarray(rows), exact)
    assert r >= 0.95, f"recall {r}"


def test_self_is_nearest(built):
    data, idx = built
    hits = idx.search(data[17], 1)
    assert hits[0]["distance"] < 1e-3


def test_ef_monotone_recall(built):
    data, idx = built
    q = data[100:150]
    _, exact = brute_force_knn(data, q, 10, "cosine")
    recalls = []
    for ef in (10, 50, 200):
        _, rows = idx.search_batch(q, 10, ef=ef)
        recalls.append(recall_at_k(np.asarray(rows), exact))
    assert recalls[-1] >= recalls[0]
    assert recalls[-1] >= 0.97


def test_graph_structure(built):
    _, idx = built
    info = idx.index_info()
    assert info["element_count"] == 1000
    assert 0 <= info["entry_point"] < 1000
    assert info["avg_connections_l0"] > 4
    # with ml = 1/ln2, P(level >= 1) = 0.5: about half the nodes at level 0
    h = info["level_histogram"]
    assert 0.4 * 1000 < h[0] < 0.6 * 1000


def test_flat_hierarchy_build_same_recall():
    # hierarchy=False (single-layer graph): layer 0 is built identically and
    # the default sampled-entry search never walks the upper layers, so
    # recall must match the hierarchical build
    data = make_unit(1000, 64, seed=3)
    idx = build_hnsw_index(data, M=16, metric="cosine", hierarchy=False)
    assert idx.graph.max_level == 0 and idx.graph.adj_upper.shape[0] == 0
    q = data[:32]
    _, exact = brute_force_knn(data, q, 10, "cosine")
    _, rows = idx.search_batch(q, 10)
    assert recall_at_k(np.asarray(rows), exact) >= 0.95


def test_clustered_data():
    data = make_clustered(800, 48, k=6, seed=11)
    idx = build_hnsw_index(data, metric="euclidean")
    q = data[:16]
    _, exact = brute_force_knn(data, q, 5, "euclidean")
    _, rows = idx.search_batch(q, 5)
    assert recall_at_k(np.asarray(rows), exact) >= 0.95


def test_empty_and_tiny():
    idx = build_hnsw_index(np.zeros((0, 16), np.float32))
    assert idx.search(np.ones(16), 5) == []
    data = make_unit(3, 16)
    idx = build_hnsw_index(data)
    hits = idx.search(data[1], 5)
    assert len(hits) == 3           # k > n returns n (core_test.clj:90-96)


def test_incremental_insert():
    data = make_unit(600, 32, seed=5)
    idx = build_hnsw_index(data[:400], M=8)
    idx.add_batch(data[400:])
    assert idx.graph.n == 600
    q = data[:16]
    _, exact = brute_force_knn(data, q, 10, "cosine")
    _, rows = idx.search_batch(q, 10, ef=100)
    r = recall_at_k(np.asarray(rows), exact)
    assert r >= 0.9, f"recall after insert {r}"
    # new nodes must be findable
    hits = idx.search(data[450], 1)
    assert hits[0]["distance"] < 1e-3


def test_incremental_insert_within_pad_slack():
    """Regression (ADVICE r1): an add_batch small enough not to grow n_pad
    used to (a) crash on read-only numpy views of the jax adjacency arrays
    and (b) leave a stale bf16 vector shadow so new rows scored against
    zeros and were silently dropped from results."""
    data = make_unit(1008, 32, seed=7)
    idx = build_hnsw_index(data[:1001], M=8)
    idx.add_batch(data[1001:])          # 7 rows, fits in the pad slack
    assert idx.graph.n == 1008
    hits = idx.search(data[1001], 1)    # exact match must be returned
    assert int(hits[0]["id"]) == 1001 and hits[0]["distance"] < 1e-3


def test_many_successive_small_waves():
    """The add!-heavy usage pattern (api/simple.clj): many small waves must
    keep the graph searchable with good recall, not just one big wave."""
    data = make_unit(640, 32, seed=11)
    idx = build_hnsw_index(data[:160], M=8)
    for start in range(160, 640, 32):
        idx.add_batch(data[start:start + 32])
    assert idx.graph.n == 640
    q = data[::40]
    _, exact = brute_force_knn(data, q, 10, "cosine")
    _, rows = idx.search_batch(q, 10, ef=128)
    r = recall_at_k(np.asarray(rows), exact)
    assert r >= 0.92, f"recall after 15 small waves {r}"


def test_persistence_roundtrip(built):
    # identical result ids after save/load (integration_test.clj:68-78)
    data, idx = built
    state = idx.to_state()
    idx2 = HNSWIndex.from_state(idx.corpus, state)
    q = data[5:10]
    _, r1 = idx.search_batch(q, 10)
    _, r2 = idx2.search_batch(q, 10)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_bf16_build_precision_quality():
    # bf16 candidate scoring (the auto policy above 50k rows) must not
    # degrade graph quality materially
    from hnsw_tpu.models.hnsw import HNSWIndex
    from hnsw_tpu.models.hnsw.build import build_graph
    from hnsw_tpu.types import Corpus

    data = make_unit(1200, 64, seed=91)
    c = Corpus.from_array(data)
    g = build_graph(c, m=16, build_precision="bf16")
    idx = HNSWIndex(c, g)
    q = data[:32]
    _, exact = brute_force_knn(data, q, 10, "cosine")
    _, rows = idx.search_batch(q, 10, ef=100)
    assert recall_at_k(np.asarray(rows), exact) >= 0.95


def test_clustered_builder_quality():
    # the large-N bucketed builder (forced at small scale): recall must stay
    # near the exact builder's
    from hnsw_tpu.models.hnsw import HNSWIndex
    from hnsw_tpu.models.hnsw.build_large import build_layer_clustered
    from hnsw_tpu.models.hnsw.graph import HNSWGraph
    from hnsw_tpu.types import Corpus
    import jax.numpy as jnp

    data = make_unit(1500, 48, seed=95)
    c = Corpus.from_array(data)
    adj0 = np.full((c.n_pad, 32), -1, np.int32)
    adj0[: c.n] = build_layer_clustered(
        c.vectors, c.sq_norms, np.arange(c.n, dtype=np.int32),
        cap=32, k_cand=48, metric=c.metric, cluster_size=256,
        n_probe_clusters=2)
    g = HNSWGraph(levels=jnp.zeros(c.n_pad, jnp.int32),
                  adj0=jnp.asarray(adj0),
                  adj_upper=jnp.zeros((0, c.n_pad, 16), jnp.int32),
                  entry=0, max_level=0, m=16, m0=32,
                  ef_construction=200, n=c.n)
    idx = HNSWIndex(c, g)
    q = data[:32]
    _, exact = brute_force_knn(data, q, 10, "cosine")
    _, rows = idx.search_batch(q, 10, ef=150)
    r = recall_at_k(np.asarray(rows), exact)
    assert r >= 0.9, f"clustered-build recall {r}"


def test_clustered_builder_refinement_quality():
    # the NN-descent polish (build_large._refine_fused) at the large-N
    # bench config (probes=4 + refinement) must push edge quality past the
    # plain bucketed builder's ~0.95 plateau — the round-3 500k recall cap.
    # Pinned at small scale with proportionally small cells.
    from hnsw_tpu.io.datagen import generate_vectors
    from hnsw_tpu.models.hnsw.build_large import build_layer_clustered
    from hnsw_tpu.types import Corpus

    # embedding-shaped corpus (low-rank, Zipf topics): the regime where the
    # bucketed builder actually loses boundary neighbors (measured here:
    # ~0.97 edge recall without refinement, ~0.999 with 2 rounds)
    data = generate_vectors(4096, 64, distribution="embedding",
                            num_clusters=32, seed=5)
    c = Corpus.from_array(data)
    xs = data / np.maximum(np.linalg.norm(data, axis=1, keepdims=True), 1e-12)
    sims = xs @ xs.T
    np.fill_diagonal(sims, -2)
    true10 = np.argsort(-sims, axis=1)[:, :10]

    def edge_recall(adj):
        return np.mean([len(set(adj[i][adj[i] >= 0]) & set(true10[i])) / 10
                        for i in range(c.n)])

    kw = dict(cap=32, k_cand=48, metric=c.metric, cluster_size=512,
              n_probe_clusters=4)
    base = edge_recall(build_layer_clustered(
        c.vectors, c.sq_norms, np.arange(c.n, dtype=np.int32),
        refine_rounds=0, **kw))
    refined = edge_recall(build_layer_clustered(
        c.vectors, c.sq_norms, np.arange(c.n, dtype=np.int32),
        refine_rounds=2, **kw))
    assert refined >= 0.99 and refined >= base, (
        f"refined edge recall {refined} (base {base})")


def test_reduced_dim_pca_pack_recall():
    # pack_dim: PCA-projected in-loop scoring + full-dim exact re-rank of a
    # widened beam prefix (models/hnsw/__init__.py lowdim path). On an
    # embedding-shaped (low-rank) corpus the principal subspace preserves
    # neighbor ordering, so recall must match the full-dim path.
    from hnsw_tpu.io.datagen import generate_vectors
    from hnsw_tpu.models import build_hnsw_index

    data = generate_vectors(1024, 256, distribution="embedding",
                            num_clusters=8, seed=11)
    full = build_hnsw_index(data, M=8)
    low = build_hnsw_index(data, M=8, pack_dim=128)
    low.pack = True          # force the packed path off-TPU
    q = data[:64]
    _, exact = brute_force_knn(data, q, 10, "cosine")
    _, rf = full.search_batch(q, 10, "fast")
    _, rl = low.search_batch(q, 10, "fast")
    r_full = recall_at_k(np.asarray(rf), exact)
    r_low = recall_at_k(np.asarray(rl), exact)
    assert r_low >= r_full - 0.02, (r_low, r_full)
    assert r_low >= 0.9, r_low
