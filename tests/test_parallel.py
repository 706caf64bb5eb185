"""Multi-device sharding tests on the virtual 8-device CPU mesh — the
cross-chip coverage the reference never had (its 'distributed backend' is a
thread pool; README.md:178 lists distributed support as TODO)."""

import numpy as np
import pytest
import jax

from tests.conftest import brute_force_knn, make_unit, recall_at_k
from hnsw_tpu.models import build_flat_index, build_partitioned_hnsw
from hnsw_tpu.parallel import (
    ShardedFlatIndex, ShardedPartitionedHNSW, make_mesh,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_sharded_exact_matches_single_device(mesh8):
    data = make_unit(500, 64, seed=13)
    single = build_flat_index(data)
    sharded = ShardedFlatIndex(single.corpus, mesh8)
    q = data[:16]
    d1, r1 = single.search_batch(q, 10)
    d2, r2 = sharded.search_batch(q, 10)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)


def test_sharded_partitioned_hnsw(mesh8):
    data = make_unit(800, 48, seed=17)
    idx = build_partitioned_hnsw(data, num_partitions=8, M=8)
    sharded = ShardedPartitionedHNSW(idx, mesh8)
    q = data[:16]
    d1, r1 = idx.search_batch(q, 10, mode="precise")
    d2, r2 = sharded.search_batch(q, 10, mode="precise")
    # same computation, different layout: identical results
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    _, exact = brute_force_knn(data, q, 10, "cosine")
    assert recall_at_k(np.asarray(r2), exact) >= 0.9


def test_sharded_partition_divisibility_error(mesh8):
    data = make_unit(100, 32)
    idx = build_partitioned_hnsw(data, num_partitions=3, M=4)
    with pytest.raises(ValueError):
        ShardedPartitionedHNSW(idx, mesh8)


def test_mesh_smaller_than_devices():
    data = make_unit(200, 32, seed=19)
    idx = build_partitioned_hnsw(data, num_partitions=4, M=4)
    mesh4 = make_mesh(4)
    sharded = ShardedPartitionedHNSW(idx, mesh4)
    d, r = sharded.search_batch(data[:4], 5, mode="precise")
    assert np.asarray(r)[0, 0] == 0  # self found


def test_sharded_partitioned_build(mesh8):
    """Index CONSTRUCTION over the mesh: every layer one shard_map dispatch
    (the distributed form of wip/partitioned.clj:43-102's parallel builds)."""
    from hnsw_tpu.parallel import build_partitioned_hnsw_sharded
    data = make_unit(1200, 48, seed=23)
    idx = build_partitioned_hnsw_sharded(data, num_partitions=8, mesh=mesh8,
                                         M=8)
    q = data[:16]
    d, r = idx.search_batch(q, 10, mode="precise")
    _, exact = brute_force_knn(data, q, 10, "cosine")
    assert recall_at_k(np.asarray(r), exact) >= 0.9
    # the stacked arrays are already mesh-sharded: wrapping is free and the
    # sharded search must agree with the replicated-layout search
    sharded = ShardedPartitionedHNSW(idx, mesh8)
    d2, r2 = sharded.search_batch(q, 10, mode="precise")
    np.testing.assert_array_equal(np.asarray(r), np.asarray(r2))


def test_sharded_partitioned_build_divisibility_error(mesh8):
    from hnsw_tpu.parallel import build_partitioned_hnsw_sharded
    with pytest.raises(ValueError):
        build_partitioned_hnsw_sharded(make_unit(100, 32), num_partitions=3,
                                       mesh=mesh8)


def test_sharded_ivf_matches_unsharded(mesh8):
    """Cluster-sharded IVF slab scan == unsharded grouped/masked scan."""
    from hnsw_tpu.models import build_ivf_flat_index
    from hnsw_tpu.parallel import ShardedIVFFlat
    data = make_unit(900, 48, seed=29)
    ivf = build_ivf_flat_index(data, num_partitions=24, spill=1)
    sharded = ShardedIVFFlat(ivf, mesh8)
    q = data[:16]
    d1, r1 = ivf.search_batch(q, 10, mode="accurate")
    d2, r2 = sharded.search_batch(q, 10, mode="accurate")
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)


def test_sharded_lloyd_matches_single_device(mesh8):
    import jax.numpy as jnp
    from hnsw_tpu.ops.kmeans import lloyd
    from hnsw_tpu.parallel.sharded import sharded_lloyd_step
    from hnsw_tpu.types import Corpus, Metric
    from jax.sharding import NamedSharding, PartitionSpec as P

    data = make_unit(256, 32, seed=41)
    c = Corpus.from_array(data)
    cents0 = c.vectors[:8]
    valid = (jnp.arange(c.n_pad) < c.n)

    # single-device: one Lloyd iteration
    cents_1, _ = lloyd(c.vectors, c.sq_norms, valid, cents0, iters=1,
                       metric=Metric.COSINE)

    # sharded: same iteration with psum-merged statistics
    shard = NamedSharding(mesh8, P("shards"))
    vecs = jax.device_put(c.vectors, shard)
    vsq = jax.device_put(c.sq_norms, shard)
    val = jax.device_put(valid.astype(jnp.float32), shard)
    cents_8, assign = sharded_lloyd_step(mesh8, vecs, vsq, val, cents0,
                                         metric=Metric.COSINE)
    np.testing.assert_allclose(np.asarray(cents_1), np.asarray(cents_8),
                               atol=1e-5)
