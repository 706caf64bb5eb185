"""Bitonic sort / top-k network (ops/sort.py) vs lax.top_k ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from hnsw_tpu.ops.sort import (bitonic_merge_sorted, bitonic_sort_kv,
                               bitonic_topk, bitonic_topk_presorted)


@pytest.mark.parametrize("length", [8, 64, 256])
def test_bitonic_sort_matches_numpy(length):
    rng = np.random.default_rng(0)
    keys = rng.standard_normal((16, length)).astype(np.float32)
    vals = rng.integers(0, 1 << 20, (16, length)).astype(np.int32)
    ks, vs = bitonic_sort_kv(jnp.asarray(keys), jnp.asarray(vals))
    ks, vs = np.asarray(ks), np.asarray(vs)
    ref = np.sort(keys, axis=-1)
    np.testing.assert_allclose(ks, ref)
    # payload rides with its key
    for b in range(16):
        got = {(k, v) for k, v in zip(ks[b], vs[b])}
        want = {(k, v) for k, v in zip(keys[b], vals[b])}
        assert got == want


def test_bitonic_topk_non_pow2_with_ties():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 8, (32, 100)).astype(np.float32)  # many ties
    vals = np.broadcast_to(np.arange(100, dtype=np.int32), (32, 100)).copy()
    dk, vk = bitonic_topk(jnp.asarray(keys), jnp.asarray(vals), 10)
    dk, vk = np.asarray(dk), np.asarray(vk)
    ref = np.sort(keys, axis=-1)[:, :10]
    np.testing.assert_allclose(dk, ref)
    for b in range(32):
        # each returned (key, payload) pair must be a real input pair, and
        # payloads must be distinct (no duplicated lane through the network)
        assert len(set(vk[b])) == 10
        for k, v in zip(dk[b], vk[b]):
            assert keys[b, v] == k


@pytest.mark.parametrize("na,nb", [(100, 128), (128, 128), (228, 96)])
def test_bitonic_topk_presorted_matches_full(na, nb):
    """The beam-merge shape: run a presorted (with -1 sentinels at BIG keys,
    as the beam carries), run b unsorted; result must equal a full top-k of
    the concatenation."""
    rng = np.random.default_rng(3)
    a = np.sort(rng.standard_normal((8, na)).astype(np.float32), axis=-1)
    a[:, -5:] = 1e30                      # empty beam slots
    va = rng.integers(0, 1 << 20, (8, na)).astype(np.int32)
    va[:, -5:] = -1
    b = rng.standard_normal((8, nb)).astype(np.float32)
    vb = rng.integers(0, 1 << 20, (8, nb)).astype(np.int32)
    k = 32
    dk, vk = bitonic_topk_presorted(jnp.asarray(a), jnp.asarray(va),
                                    jnp.asarray(b), jnp.asarray(vb), k)
    dk, vk = np.asarray(dk), np.asarray(vk)
    allk = np.concatenate([a, b], axis=-1)
    ref = np.sort(allk, axis=-1)[:, :k]
    np.testing.assert_allclose(dk, ref)
    for r in range(8):
        want = {(x, y) for x, y in zip(allk[r], np.concatenate([va[r],
                                                                vb[r]]))}
        for x, y in zip(dk[r], vk[r]):
            assert (x, y) in want, (r, x, y)


def test_bitonic_merge_sorted_runs():
    rng = np.random.default_rng(2)
    a = np.sort(rng.standard_normal((4, 64)).astype(np.float32), axis=-1)
    b = np.sort(rng.standard_normal((4, 64)).astype(np.float32), axis=-1)
    va = np.zeros((4, 64), np.int32)
    vb = np.ones((4, 64), np.int32)
    ks, vs = bitonic_merge_sorted(jnp.asarray(a), jnp.asarray(va),
                                  jnp.asarray(b), jnp.asarray(vb))
    ks = np.asarray(ks)
    ref = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
    np.testing.assert_allclose(ks, ref)
