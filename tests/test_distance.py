"""Unit tests for the distance kernel layer — exact-value checks mirroring
the reference's core_test.clj:9-31 (euclidean of [0,0]-[3,4] = 5.0, cosine of
opposite vectors = 2.0)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hnsw_tpu.ops.distance import (
    score_block, pairwise_distances, gather_score, normalize,
)
from hnsw_tpu.types import Metric


def test_euclidean_exact_value():
    # reference: core_test.clj asserts distance([0,0],[3,4]) == 5.0
    q = jnp.zeros((1, 128))
    v = jnp.zeros((8, 128)).at[0, 0].set(3.0).at[0, 1].set(4.0)
    v_sq = jnp.sum(v * v, axis=-1)
    d = score_block(q, v, v_sq, metric=Metric.EUCLIDEAN)
    assert abs(float(d[0, 0]) - 5.0) < 1e-5


def test_cosine_opposite_vectors():
    # reference: cosine distance of opposite vectors == 2.0
    q = jnp.zeros((1, 128)).at[0, 0].set(1.0)
    v = jnp.zeros((8, 128)).at[0, 0].set(-1.0).at[1, 0].set(1.0)
    v_sq = jnp.sum(v * v, axis=-1)
    d = score_block(q, v, v_sq, metric=Metric.COSINE)
    assert abs(float(d[0, 0]) - 2.0) < 1e-5   # opposite
    assert abs(float(d[0, 1]) - 0.0) < 1e-5   # identical


def test_dot_metric_orders_by_inner_product():
    q = jnp.ones((1, 128))
    v = jnp.stack([jnp.ones(128) * 2, jnp.ones(128), jnp.zeros(128)])
    v_sq = jnp.sum(v * v, axis=-1)
    d = np.asarray(score_block(q, v, v_sq, metric=Metric.DOT))[0]
    assert d[0] < d[1] < d[2]


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot"])
def test_matches_numpy(metric, unit_vecs_small):
    from tests.conftest import brute_force_knn
    data = unit_vecs_small
    q = data[:5] + 0.01
    v = jnp.asarray(np.pad(data, ((0, 0), (0, 96))))
    v_sq = jnp.sum(v * v, axis=-1)
    qj = jnp.asarray(np.pad(q, ((0, 0), (0, 96))))
    d = np.asarray(score_block(qj, v, v_sq, metric=Metric(metric)))
    exact_d, exact_i = brute_force_knn(data, q, 10, metric)
    mine = np.argsort(d, axis=1)[:, :10]
    assert (mine == exact_i).mean() > 0.99
    np.testing.assert_allclose(
        np.take_along_axis(d, exact_i, axis=1), exact_d, atol=5e-3)


def test_gather_score_masks_invalid():
    v = jnp.asarray(np.random.default_rng(0).standard_normal((16, 128)),
                    dtype=jnp.float32)
    v_sq = jnp.sum(v * v, axis=-1)
    q = v[:2]
    rows = jnp.array([[0, 1], [2, 3]], jnp.int32)
    valid = jnp.array([[True, False], [True, True]])
    d = np.asarray(gather_score(q, rows, v, v_sq, metric=Metric.EUCLIDEAN,
                                valid=valid))
    assert d[0, 0] < 2e-2          # ~0: norm-formula f32 residue under sqrt
    assert d[0, 1] > 1e29          # masked
    assert d[1, 0] < 1e30


def test_normalize():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 64)),
                    dtype=jnp.float32)
    n = np.linalg.norm(np.asarray(normalize(x)), axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_pairwise_symmetry():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((8, 64)),
                    dtype=jnp.float32)
    d = np.asarray(pairwise_distances(x, x, metric=Metric.EUCLIDEAN))
    np.testing.assert_allclose(d, d.T, atol=1e-4)
    # self-distance via the norm formula: sqrt amplifies f32 residue
    np.testing.assert_allclose(np.diag(d), 0.0, atol=2e-2)
