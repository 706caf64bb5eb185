"""Opt-in REAL-TPU kernel smoke tests: compile + run every Pallas kernel
variant on the actual chip with tiny shapes.

Interpret mode (the rest of the suite) cannot catch Mosaic's alignment
rejections — e.g. per-row dynamic VMEM indexing is rejected only by a real
TPU compile (see ops/pallas_hop.py STRIP) — so kernel variants that the
bench doesn't happen to exercise can rot invisibly. This file compiles the
full kernel matrix: bucket/sweep x bf16/int8 x all three metrics, plus the
ring-DMA hop kernel (bf16 + int8 packs) at both expand widths.

(Shape note, itself a smoke-test catch: small corpus tiles fail Mosaic
layout verification — XLA lays a small 1-D f32 operand out as ONE tile
(f32[1024] -> T(1024)), so the (nt,) block specs must cover the whole
padded array here: nt == n_pad. Production configs use nt in
{1024, 2048} over long arrays and are unaffected.)

Run standalone with the real backend (skipped otherwise):

    HNSW_TPU_REAL=1 python -m pytest tests/test_real_tpu.py -x -q

(conftest.py leaves the platform alone when HNSW_TPU_REAL is set; the env's
axon relay then provides the chip. ONE TPU client at a time — never run
this concurrently with a bench. First run compiles ~12 tiny programs,
~2-4 min through the relay; the persistent compile cache makes repeats
fast.)
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("HNSW_TPU_REAL"),
    reason="real-TPU smoke tests are opt-in (HNSW_TPU_REAL=1)")

jnp = None
METRICS = ["cosine", "euclidean", "dot"]


@pytest.fixture(scope="module", autouse=True)
def _tpu():
    global jnp
    import jax
    import jax.numpy as _jnp
    jnp = _jnp
    from hnsw_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if jax.default_backend() != "tpu":
        pytest.skip(f"backend is {jax.default_backend()}, not tpu")


def _corpus(n=500, d=128, seed=11):
    r = np.random.default_rng(seed)
    x = r.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _exact_rows(x, q, k, metric):
    dots = q @ x.T
    if metric == "cosine":
        dist = 1.0 - dots
    elif metric == "euclidean":
        qs = (q * q).sum(1, keepdims=True)
        xs = (x * x).sum(1)
        dist = np.maximum(qs + xs[None, :] - 2 * dots, 0.0)
    else:
        dist = -dots
    return np.argsort(dist, axis=1, kind="stable")[:, :k]


def _recall(rows, exact):
    hits = sum(len(set(a.tolist()) & set(e.tolist()))
               for a, e in zip(np.asarray(rows), exact))
    return hits / exact.size


@pytest.mark.parametrize("metric", METRICS)
@pytest.mark.parametrize("kernel", ["bucket", "sweep"])
def test_bf16_scan_kernels_compile_on_tpu(kernel, metric):
    from hnsw_tpu.ops.pallas_scan import pallas_bucket_topk, pallas_exact_topk
    from hnsw_tpu.types import Metric

    x = _corpus()
    n_pad = 1024
    vec = jnp.zeros((n_pad, 128), jnp.bfloat16).at[:500].set(
        jnp.asarray(x, jnp.bfloat16))
    vsq = jnp.zeros((n_pad,), jnp.float32).at[:500].set(
        jnp.asarray((x * x).sum(1)))
    q = jnp.asarray(x[:64], jnp.bfloat16)
    kern = pallas_bucket_topk if kernel == "bucket" else pallas_exact_topk
    d, r = kern(vec, vsq, q, 500, k=10, metric=Metric(metric),
                bt=64, nt=1024)
    r = np.asarray(r)
    assert (r >= 0).all() and (r < 500).all()
    # smoke threshold: this asserts sane output, not precision
    # (precision is covered by interpret tests + measured bench recalls);
    # bf16/int8 rank noise among near-equidistant random unit vectors is
    # the limiter, not the kernel
    assert _recall(r, _exact_rows(x, x[:64], 10, metric)) >= 0.8


@pytest.mark.parametrize("metric", METRICS)
@pytest.mark.parametrize("kernel", ["bucket", "sweep"])
def test_int8_scan_kernels_compile_on_tpu(kernel, metric):
    from hnsw_tpu.ops.pallas_scan import (pallas_int8_bucket_topk,
                                          pallas_int8_topk)
    from hnsw_tpu.types import Metric

    x = _corpus(seed=12)
    n_pad = 1024
    v = jnp.zeros((n_pad, 128), jnp.float32).at[:500].set(jnp.asarray(x))
    vmax = jnp.maximum(jnp.max(jnp.abs(v), axis=1, keepdims=True), 1e-12)
    vscale = vmax / 127.0
    v8 = jnp.clip(jnp.round(v / vscale), -127, 127).astype(jnp.int8)
    vsq = jnp.zeros((n_pad,), jnp.float32).at[:500].set(
        jnp.asarray((x * x).sum(1)))
    qf = jnp.asarray(x[:64])
    qscale = jnp.maximum(jnp.max(jnp.abs(qf), 1, keepdims=True), 1e-12) / 127.0
    q8 = jnp.clip(jnp.round(qf / qscale), -127, 127).astype(jnp.int8)
    qmeta = jnp.concatenate([qscale, jnp.sum(qf * qf, 1, keepdims=True)], 1)
    kern = pallas_int8_bucket_topk if kernel == "bucket" else pallas_int8_topk
    d, r = kern(v8, vscale[:, 0], vsq, q8, qmeta, 500, k=10,
                metric=Metric(metric), bt=64, nt=1024)
    r = np.asarray(r)
    assert (r >= 0).all() and (r < 500).all()
    assert _recall(r, _exact_rows(x, x[:64], 10, metric)) >= 0.8


@pytest.mark.parametrize("variant", ["bf16", "int8_rerank", "int8_coarse",
                                     "int8_packed"])
def test_flat_index_pallas_paths_on_tpu(variant):
    """End-to-end FlatIndex dispatch through the real Pallas kernels — the
    level where a round-5 import regression (pallas_int8_bucket_topk
    dropped from _int8_pallas's imports) slipped past the CPU suite, which
    never reaches _int8_pallas (TPU-backend-only branch)."""
    from hnsw_tpu.models.flat import FlatIndex
    from hnsw_tpu.types import Corpus

    x = _corpus(seed=15)
    c = Corpus.from_array(x)
    if variant == "bf16":
        idx = FlatIndex(c, precision="bf16")
    elif variant == "int8_rerank":
        idx = FlatIndex(c, precision="int8")
    elif variant == "int8_coarse":
        idx = FlatIndex(c, precision="int8", int8_fetch=0)
    else:
        idx = FlatIndex(c, precision="int8", int8_fetch=0,
                        scan_kernel="packed")
    d, r = idx.search_batch(x[:64], 10)
    r = np.asarray(r)
    assert (r >= 0).all() and (r < 500).all()
    assert (r[:, 0] == np.arange(64)).all()          # self is nearest
    assert (np.diff(np.asarray(d), axis=1) >= -1e-5).all()


@pytest.mark.parametrize("expand", [4, 8])
def test_hop_kernel_bf16_compiles_on_tpu(expand):
    from hnsw_tpu.ops.pallas_hop import hop_score

    rng = np.random.default_rng(13)
    n, m0, d, b = 256, 32, 128, 64
    pack_np = rng.standard_normal((n, m0, d)).astype(np.float32)
    pack = jnp.asarray(pack_np, jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    sel = jnp.asarray(rng.integers(0, n, (b, expand)), jnp.int32)
    dots, csq = hop_score(pack, q, sel, tb=b)
    blocks = np.asarray(pack, np.float32)[np.asarray(sel)].reshape(
        b, expand * m0, d)
    ref = np.einsum("bd,bcd->bc",
                    np.asarray(q.astype(jnp.bfloat16), np.float32), blocks)
    np.testing.assert_allclose(np.asarray(dots), ref, atol=0.3)
    np.testing.assert_allclose(np.asarray(csq), (blocks ** 2).sum(-1),
                               rtol=3e-2)


@pytest.mark.parametrize("expand", [4, 8])
def test_hop_kernel_int8_compiles_on_tpu(expand):
    from hnsw_tpu.ops.pallas_hop import hop_score_int8

    rng = np.random.default_rng(14)
    n, m0, d, b = 256, 32, 128, 64
    codes_np = rng.integers(-127, 128, (n, m0, d)).astype(np.int8)
    codes = jnp.asarray(codes_np)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    sel = jnp.asarray(rng.integers(0, n, (b, expand)), jnp.int32)
    dots = hop_score_int8(codes, q, sel, tb=b)
    blocks = codes_np.astype(np.float32)[np.asarray(sel)]
    ref = np.einsum("bd,bcd->bc", np.asarray(q),
                    blocks.reshape(b, expand * m0, d))
    np.testing.assert_allclose(np.asarray(dots), ref, rtol=2e-2, atol=16.0)
