"""Connectivity repair (models/hnsw/repair.py): label propagation,
Boruvka bridging, and the build_graph integration that fixes the
clustered-corpus recall ceiling (the reference's sequential insert wires
clusters together implicitly, ultra_fast.clj:216-275; a batch builder
must repair explicitly)."""

import jax.numpy as jnp
import numpy as np

from tests.conftest import brute_force_knn, make_unit, recall_at_k
from hnsw_tpu.models.hnsw.repair import bridge_components, connected_labels


def bfs_reachable(adj: np.ndarray, start: int) -> int:
    seen = np.zeros(adj.shape[0], bool)
    seen[start] = True
    frontier = [start]
    while frontier:
        nxt = adj[frontier].ravel()
        nxt = nxt[nxt >= 0]
        nxt = nxt[~seen[nxt]]
        if len(nxt) == 0:
            break
        nxt = np.unique(nxt)
        seen[nxt] = True
        frontier = nxt.tolist()
    return int(seen.sum())


def test_connected_labels_two_rings():
    # ring 0-1-2-3, ring 4-5-6-7 (directed edges; closure is undirected)
    adj = np.full((8, 2), -1, np.int32)
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
                 (7, 4)]:
        adj[a, 0] = b
    labels = np.asarray(connected_labels(jnp.asarray(adj)))
    assert set(labels[:4]) == {0}
    assert set(labels[4:]) == {4}


def test_connected_labels_undirected_closure():
    # only a one-way edge 5 -> 2: labels must still merge (scatter push)
    adj = np.full((8, 1), -1, np.int32)
    adj[5, 0] = 2
    labels = np.asarray(connected_labels(jnp.asarray(adj)))
    assert labels[5] == labels[2] == 2
    assert labels[0] == 0 and labels[7] == 7


def _separated_blobs(n_clusters, per, dim, seed=0, spread=0.3, gap=4.0):
    # spread/gap keep blobs far apart (disconnected kNN graphs) while
    # within-blob distances stay >> the f32 norm-formula cancellation at
    # these norms (the CLAUDE.md euclidean-precision gotcha): with
    # spread 0.02 / gap 10, near-ties reshuffle on ~4e-4 f32 error and
    # recall@10 measures tie order, not search quality
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * gap
    pts = np.concatenate([
        centers[i] + spread * rng.standard_normal((per, dim)).astype(
            np.float32) for i in range(n_clusters)])
    return pts


def test_bridge_components_connects_blobs():
    dim, per, k = 16, 32, 5
    data = _separated_blobs(k, per, dim, seed=3)
    n = k * per
    # intra-cluster ring adjacency: k disjoint components by construction
    adj = np.full((n, 4), -1, np.int32)
    for c in range(k):
        base = c * per
        for i in range(per):
            adj[base + i, 0] = base + (i + 1) % per
    v = jnp.asarray(data)
    sq = jnp.sum(v * v, axis=-1)
    fixed, nb = bridge_components(v, sq, adj, np.arange(n, dtype=np.int32),
                                  metric="euclidean")
    assert nb >= k - 1                      # spanning bridges at minimum
    assert bfs_reachable(fixed, 0) == n     # one component now
    # original edges survive (bridges fill free slots first)
    assert all(fixed[i, 0] == adj[i, 0] for i in range(n))


def test_build_graph_repairs_clustered_corpus():
    # far-apart blobs: exact-kNN layer build yields per-blob components;
    # the repair must make the whole graph reachable and recall must not
    # be capped by unreachable rows
    data = _separated_blobs(6, 100, 32, seed=9)
    from hnsw_tpu.models.hnsw import build_hnsw_index
    idx = build_hnsw_index(data, M=8, metric="euclidean")
    adj0 = np.asarray(idx.graph.adj0)[: idx.graph.n]
    assert bfs_reachable(adj0, int(idx.graph.entry)) == idx.graph.n
    assert idx.graph.n_bridges > 0
    assert idx.index_info()["bridge_edges"] == idx.graph.n_bridges
    q = data[::25]
    _, exact = brute_force_knn(data, q, 10, "euclidean")
    _, rows = idx.search_batch(q, 10, ef=200)
    r = recall_at_k(np.asarray(rows), exact)
    assert r >= 0.95, f"clustered recall {r}"


def test_repair_noop_on_connected_graph():
    # a well-mixed corpus is already connected: no bridges added
    data = make_unit(500, 32, seed=21)
    from hnsw_tpu.models.hnsw import build_hnsw_index
    idx = build_hnsw_index(data, M=8)
    adj0 = np.asarray(idx.graph.adj0)[: idx.graph.n]
    assert bfs_reachable(adj0, int(idx.graph.entry)) == idx.graph.n
    assert idx.graph.n_bridges == 0
