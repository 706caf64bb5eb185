"""Pallas fused-scan kernel tests (interpret mode on the CPU backend)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import brute_force_knn, make_unit, recall_at_k
from hnsw_tpu.ops.pallas_scan import pallas_exact_topk
from hnsw_tpu.types import Corpus, Metric


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot"])
def test_matches_bruteforce(metric):
    data = make_unit(1000, 64, seed=71)
    c = Corpus.from_array(data, metric=metric)
    n_pad = 1024
    vec = jnp.zeros((n_pad, c.d_pad)).at[: c.n_pad].set(c.vectors)
    vsq = jnp.zeros((n_pad,)).at[: c.n_pad].set(c.sq_norms)
    q = c.pad_queries(data[:128])
    d, r = pallas_exact_topk(vec, vsq, q, c.n, k=10,
                             metric=Metric(metric), bt=128, nt=256,
                             interpret=True)
    _, exact = brute_force_knn(data, data[:128], 10, metric)
    rec = recall_at_k(np.asarray(r), exact)
    assert rec >= 0.99, rec
    # ascending, valid rows
    d = np.asarray(d)
    assert (np.diff(d, axis=1) >= -1e-6).all()
    assert (np.asarray(r) < 1000).all() and (np.asarray(r) >= 0).all()


def test_padding_rows_never_returned():
    data = make_unit(100, 32, seed=72)
    c = Corpus.from_array(data)
    n_pad = 256
    vec = jnp.zeros((n_pad, c.d_pad)).at[: c.n_pad].set(c.vectors)
    vsq = jnp.zeros((n_pad,)).at[: c.n_pad].set(c.sq_norms)
    q = c.pad_queries(data[:128]) if False else jnp.tile(
        c.pad_queries(data[:4]), (32, 1))
    d, r = pallas_exact_topk(vec, vsq, q, c.n, k=5, metric=Metric.COSINE,
                             bt=128, nt=128, interpret=True)
    r = np.asarray(r)
    assert (r < 100).all() and (r >= 0).all()


def test_k_greater_than_valid_rows():
    data = make_unit(6, 16, seed=73)
    c = Corpus.from_array(data)
    vec = jnp.zeros((128, c.d_pad)).at[: c.n_pad].set(c.vectors)
    vsq = jnp.zeros((128,)).at[: c.n_pad].set(c.sq_norms)
    q = jnp.tile(c.pad_queries(data[:1]), (128, 1))
    d, r = pallas_exact_topk(vec, vsq, q, c.n, k=10, metric=Metric.COSINE,
                             bt=128, nt=128, interpret=True)
    r = np.asarray(r)
    assert (r[0, :6] >= 0).all()
    assert (r[0, 6:] == -1).all()


def test_int8_kernel_matches_bruteforce():
    from hnsw_tpu.ops.pallas_scan import pallas_int8_topk

    data = make_unit(600, 64, seed=77)
    c = Corpus.from_array(data)
    n_pad = 1024
    v = jnp.zeros((n_pad, c.d_pad)).at[: c.n_pad].set(c.vectors)
    vmax = jnp.maximum(jnp.max(jnp.abs(v), axis=1, keepdims=True), 1e-12)
    vscale = vmax / 127.0
    v8 = jnp.clip(jnp.round(v / vscale), -127, 127).astype(jnp.int8)
    vsq = jnp.zeros((n_pad,)).at[: c.n_pad].set(c.sq_norms)

    qf = c.pad_queries(data[:128])
    qscale = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True), 1e-12) / 127.0
    q8 = jnp.clip(jnp.round(qf / qscale), -127, 127).astype(jnp.int8)
    qmeta = jnp.concatenate([qscale, jnp.sum(qf * qf, 1, keepdims=True)], 1)

    d, r = pallas_int8_topk(v8, vscale[:, 0], vsq, q8, qmeta, c.n,
                            k=20, metric=Metric.COSINE, bt=128, nt=256,
                            interpret=True)
    _, exact = brute_force_knn(data, data[:128], 10, "cosine")
    # coarse top-20 must contain nearly all exact top-10
    rec = recall_at_k(np.asarray(r), exact)
    assert rec >= 0.98, rec


def test_multiple_query_tiles():
    data = make_unit(300, 32, seed=79)
    c = Corpus.from_array(data)
    n_pad = 512
    vec = jnp.zeros((n_pad, c.d_pad)).at[: c.n_pad].set(c.vectors)
    vsq = jnp.zeros((n_pad,)).at[: c.n_pad].set(c.sq_norms)
    q = c.pad_queries(data[:256])          # 2 query tiles at bt=128
    d, r = pallas_exact_topk(vec, vsq, q, c.n, k=5, metric=Metric.COSINE,
                             bt=128, nt=256, interpret=True)
    _, exact = brute_force_knn(data, data[:256], 5, "cosine")
    assert recall_at_k(np.asarray(r), exact) >= 0.99
    # each query's own row is its nearest
    np.testing.assert_array_equal(np.asarray(r)[:, 0], np.arange(256))


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot"])
def test_bucketed_matches_bruteforce(metric):
    from hnsw_tpu.ops.pallas_scan import pallas_bucket_topk

    data = make_unit(1000, 64, seed=81)
    c = Corpus.from_array(data, metric=metric)
    n_pad = 1024
    vec = jnp.zeros((n_pad, c.d_pad)).at[: c.n_pad].set(c.vectors)
    vsq = jnp.zeros((n_pad,)).at[: c.n_pad].set(c.sq_norms)
    q = c.pad_queries(data[:128])
    d, r = pallas_bucket_topk(vec, vsq, q, c.n, k=10,
                              metric=Metric(metric), bt=128, nt=256,
                              interpret=True)
    _, exact = brute_force_knn(data, data[:128], 10, metric)
    assert recall_at_k(np.asarray(r), exact) >= 0.98
    d = np.asarray(d)
    assert (np.diff(d, axis=1) >= -1e-5).all()          # ascending
    r = np.asarray(r)
    assert (r < 1000).all() and (r >= 0).all()          # no padding leaked
    # reconstructed distances match exact f32 distances closely
    de, _ = brute_force_knn(data, data[:128], 10, metric)
    assert np.abs(d[:, 0] - de[:, 0]).max() < 1e-2


def test_bucketed_k_greater_than_valid_rows():
    from hnsw_tpu.ops.pallas_scan import pallas_bucket_topk

    data = make_unit(6, 16, seed=83)
    c = Corpus.from_array(data)
    vec = jnp.zeros((256, c.d_pad)).at[: c.n_pad].set(c.vectors)
    vsq = jnp.zeros((256,)).at[: c.n_pad].set(c.sq_norms)
    q = jnp.tile(c.pad_queries(data[:1]), (128, 1))
    d, r = pallas_bucket_topk(vec, vsq, q, c.n, k=10, metric=Metric.COSINE,
                              bt=128, nt=256, interpret=True)
    r = np.asarray(r)
    assert (r[0, :6] >= 0).all()
    assert (r[0, 6:] == -1).all()


def test_int8_bucketed_candidates():
    from hnsw_tpu.ops.pallas_scan import pallas_int8_bucket_topk

    data = make_unit(600, 64, seed=87)
    c = Corpus.from_array(data)
    n_pad = 1024
    v = jnp.zeros((n_pad, c.d_pad)).at[: c.n_pad].set(c.vectors)
    vmax = jnp.maximum(jnp.max(jnp.abs(v), axis=1, keepdims=True), 1e-12)
    vscale = vmax / 127.0
    v8 = jnp.clip(jnp.round(v / vscale), -127, 127).astype(jnp.int8)
    vsq = jnp.zeros((n_pad,)).at[: c.n_pad].set(c.sq_norms)
    qf = c.pad_queries(data[:128])
    qscale = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True),
                         1e-12) / 127.0
    q8 = jnp.clip(jnp.round(qf / qscale), -127, 127).astype(jnp.int8)
    qmeta = jnp.concatenate([qscale, jnp.sum(qf * qf, 1, keepdims=True)], 1)
    d, r = pallas_int8_bucket_topk(v8, vscale[:, 0], vsq, q8, qmeta, c.n,
                                   k=20, metric=Metric.COSINE, bt=128,
                                   nt=256, interpret=True)
    _, exact = brute_force_knn(data, data[:128], 10, "cosine")
    assert recall_at_k(np.asarray(r), exact) >= 0.98


@pytest.mark.parametrize("metric", ["cosine", "dot"])
def test_int8_packed_matches_bucket(metric):
    """The packed-key kernel (payload-free min2; see pallas_scan.py) must
    return the same candidate ordering as the payload-carrying bucket
    kernel, and its un-biased keys must match the bucket kernel's keys to
    within the masked-mantissa quantum (~0.03 absolute at BIAS=16384)."""
    from hnsw_tpu.ops.pallas_scan import (pallas_int8_bucket_topk,
                                          pallas_int8_packed_topk)

    data = make_unit(900, 64, seed=93)
    c = Corpus.from_array(data, metric=metric)
    n_pad = 1024
    v = jnp.zeros((n_pad, c.d_pad)).at[: c.n_pad].set(c.vectors)
    vmax = jnp.maximum(jnp.max(jnp.abs(v), axis=1, keepdims=True), 1e-12)
    vscale = vmax / 127.0
    v8 = jnp.clip(jnp.round(v / vscale), -127, 127).astype(jnp.int8)
    vsq = jnp.zeros((n_pad,)).at[: c.n_pad].set(c.sq_norms)
    qf = c.pad_queries(data[:64])
    qscale = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True),
                         1e-12) / 127.0
    q8 = jnp.clip(jnp.round(qf / qscale), -127, 127).astype(jnp.int8)
    qmeta = jnp.concatenate([qscale, jnp.sum(qf * qf, 1, keepdims=True)], 1)
    args = (v8, vscale[:, 0], vsq, q8, qmeta, c.n)
    kw = dict(k=10, metric=Metric(metric), bt=64, nt=256, interpret=True)
    db, rb = pallas_int8_bucket_topk(*args, **kw)
    dp, rp = pallas_int8_packed_topk(*args, **kw)
    # identical candidate sets per query (order may differ inside the
    # masked-mantissa quantum)
    for i in range(64):
        assert set(np.asarray(rp)[i].tolist()) == \
            set(np.asarray(rb)[i].tolist()), i
    # keys agree within the packed quantum
    assert np.abs(np.sort(np.asarray(dp), 1)
                  - np.sort(np.asarray(db), 1)).max() < 0.05
    # exact top-10 recovered
    _, exact = brute_force_knn(data, data[:64], 10, metric)
    assert recall_at_k(np.asarray(rp), exact) >= 0.97
    # padding rows never leak
    assert (np.asarray(rp) < 900).all() and (np.asarray(rp) >= 0).all()


def test_int8_packed_k_greater_than_valid_rows():
    from hnsw_tpu.ops.pallas_scan import pallas_int8_packed_topk

    data = make_unit(6, 16, seed=94)
    c = Corpus.from_array(data)
    v = jnp.zeros((256, c.d_pad)).at[: c.n_pad].set(c.vectors)
    vmax = jnp.maximum(jnp.max(jnp.abs(v), axis=1, keepdims=True), 1e-12)
    vscale = vmax / 127.0
    v8 = jnp.clip(jnp.round(v / vscale), -127, 127).astype(jnp.int8)
    vsq = jnp.zeros((256,)).at[: c.n_pad].set(c.sq_norms)
    qf = jnp.tile(c.pad_queries(data[:1]), (64, 1))
    qscale = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True),
                         1e-12) / 127.0
    q8 = jnp.clip(jnp.round(qf / qscale), -127, 127).astype(jnp.int8)
    qmeta = jnp.concatenate([qscale, jnp.sum(qf * qf, 1, keepdims=True)], 1)
    d, r = pallas_int8_packed_topk(v8, vscale[:, 0], vsq, q8, qmeta, c.n,
                                   k=10, metric=Metric.COSINE, bt=64,
                                   nt=256, interpret=True)
    r = np.asarray(r)
    assert (r[0, :6] >= 0).all()
    assert (r[0, 6:] == -1).all()


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot"])
def test_int8_coarse_distance_reconstruction(metric):
    """Coarse-only int8 mode (FlatIndex int8_fetch=0) reconstructs true
    distances from the kernel's monotone key: cosine d = 1 + key*qs/|q|,
    l2 d = sqrt(key + |q|^2), dot d = key*qs (key = -dots_i32*vscale).
    The reconstruction must land within int8 quantization error of the
    exact distances for the selected rows."""
    from hnsw_tpu.ops.pallas_scan import pallas_int8_bucket_topk

    data = make_unit(600, 64, seed=88)
    c = Corpus.from_array(data, metric=metric)
    n_pad = 1024
    v = jnp.zeros((n_pad, c.d_pad)).at[: c.n_pad].set(c.vectors)
    vmax = jnp.maximum(jnp.max(jnp.abs(v), axis=1, keepdims=True), 1e-12)
    vscale = vmax / 127.0
    v8 = jnp.clip(jnp.round(v / vscale), -127, 127).astype(jnp.int8)
    vsq = jnp.zeros((n_pad,)).at[: c.n_pad].set(c.sq_norms)
    qf = c.pad_queries(data[:64])
    qscale = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True),
                         1e-12) / 127.0
    q8 = jnp.clip(jnp.round(qf / qscale), -127, 127).astype(jnp.int8)
    q_sq = jnp.sum(qf * qf, 1, keepdims=True)
    qmeta = jnp.concatenate([qscale, q_sq], 1)
    dk, r = pallas_int8_bucket_topk(v8, vscale[:, 0], vsq, q8, qmeta, c.n,
                                    k=10, metric=Metric(metric), bt=64,
                                    nt=256, interpret=True)
    if metric == "cosine":
        dist = 1.0 + np.asarray(dk) * np.asarray(qscale) \
            / np.sqrt(np.maximum(np.asarray(q_sq), 1e-12))
    elif metric == "euclidean":
        dist = np.sqrt(np.maximum(np.asarray(dk) + np.asarray(q_sq), 0.0))
    else:                               # dot: dist = -dots = key * qscale
        dist = np.asarray(dk) * np.asarray(qscale)
    exact_d, exact_r = brute_force_knn(data, data[:64], 10, metric)
    assert recall_at_k(np.asarray(r), exact_r) >= 0.97
    # reconstructed distances track the exact ones for matching rows
    # int8 dot noise is additive in the KEY (~|q||v|*3e-3), i.e. in d for
    # cosine/dot but in d^2 for euclidean (where sqrt blows it up near
    # zero) — so compare in the key's own domain
    r_np = np.asarray(r)
    p = 2 if metric == "euclidean" else 1
    for i in range(8):
        for j in range(10):
            if r_np[i, j] == exact_r[i, j]:
                assert abs(dist[i, j] ** p - exact_d[i, j] ** p) < 0.02, (
                    i, j, dist[i, j], exact_d[i, j])
    # ascending keys => ascending reconstructed distances
    assert (np.diff(dist, axis=1) >= -1e-5).all()
