"""Ring-DMA hop-scoring kernel (ops/pallas_hop.py), interpret mode.

The kernel fuses the hop loop's neighborhood gather + query-dot and
recomputes neighbor squared norms from the landed bf16 block (the distances
are then exact for the bf16-rounded corpus). Verified against a plain
gather+einsum reference; shapes cover tb == b, tb < b (grid > 1), and a
ring deeper than the tile.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from hnsw_tpu.ops.pallas_hop import hop_score  # noqa: E402


def _reference(pack, q, sel):
    blocks = np.asarray(pack, np.float32)[np.asarray(sel)]   # [B, E, M0, D]
    b, e, m0, d = blocks.shape
    blocks = blocks.reshape(b, e * m0, d)
    qf = np.asarray(q, np.float32)
    dots = np.einsum("bd,bcd->bc", qf, blocks)
    csq = (blocks ** 2).sum(-1)
    return dots, csq


@pytest.mark.parametrize("b,tb,ring", [(32, 32, 4), (64, 16, 8), (16, 16, 32)])
def test_hop_score_matches_reference(b, tb, ring):
    rng = np.random.default_rng(3)
    n, m0, d, e = 256, 8, 128, 4
    pack = jnp.asarray(rng.standard_normal((n, m0, d)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    sel = jnp.asarray(rng.integers(0, n, (b, e)), jnp.int32)
    dots, csq = hop_score(pack, q, sel, tb=tb, ring=ring, interpret=True)
    ref_dots, ref_csq = _reference(pack, q.astype(jnp.bfloat16), sel)
    np.testing.assert_allclose(np.asarray(dots), ref_dots, atol=2e-1)
    np.testing.assert_allclose(np.asarray(csq), ref_csq, rtol=2e-2)


@pytest.mark.parametrize("b,tb,ring", [(32, 32, 4), (64, 16, 8)])
def test_hop_score_int8_matches_reference(b, tb, ring):
    """int8-pack variant: raw dots must equal q . codes (the caller applies
    the per-packed-row scale); m0=32 = one int8 sublane tile."""
    from hnsw_tpu.ops.pallas_hop import hop_score_int8

    rng = np.random.default_rng(5)
    n, m0, d, e = 128, 32, 128, 4
    codes = jnp.asarray(rng.integers(-127, 128, (n, m0, d)), jnp.int8)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    sel = jnp.asarray(rng.integers(-1, n, (b, e)), jnp.int32)
    dots = hop_score_int8(codes, q, sel, tb=tb, ring=ring, interpret=True)
    blocks = np.asarray(codes, np.float32)[np.asarray(jnp.maximum(sel, 0))]
    ref = np.einsum("bd,bcd->bc",
                    np.asarray(q.astype(jnp.bfloat16), np.float32),
                    blocks.reshape(b, e * m0, d))
    # bf16 query rounding + f32 accumulate: relative tolerance on dots of
    # magnitude ~127*sqrt(d)
    np.testing.assert_allclose(np.asarray(dots), ref, rtol=2e-2, atol=16.0)


def test_int8_pack_search_end_to_end():
    """HNSW search over an int8 packed-neighborhood table (XLA block path on
    CPU; the Pallas kernel is exercised in interpret mode above and by the
    real-TPU smoke tests): recall must match the bf16 pack's within the
    int8 code-rounding band."""
    from hnsw_tpu.models import build_hnsw_index
    from tests.conftest import brute_force_knn, make_unit, recall_at_k

    data = make_unit(800, 128, seed=91)
    idx = build_hnsw_index(data, pack_precision="int8")
    idx.pack = True    # force the pack on (auto would also take it)
    d, r = idx.search_batch(data[:64], 10, "balanced")
    assert idx._nbr_pack is not None and idx._nbr_pack.dtype == jnp.int8
    assert idx._nbr_scale is not None
    _, exact = brute_force_knn(data, data[:64], 10, "cosine")
    assert recall_at_k(np.asarray(r), exact) >= 0.95
    d = np.asarray(d)
    assert (np.diff(d, axis=1) >= -1e-6).all()
    assert (np.asarray(r)[:, 0] == np.arange(64)).all()


def test_hop_score_clamps_negative_rows():
    rng = np.random.default_rng(4)
    n, m0, d, b, e = 64, 8, 128, 8, 2
    pack = jnp.asarray(rng.standard_normal((n, m0, d)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    sel = jnp.asarray(rng.integers(-1, n, (b, e)), jnp.int32)
    dots, csq = hop_score(pack, q, sel, interpret=True)
    ref_dots, _ = _reference(pack, q.astype(jnp.bfloat16),
                             jnp.maximum(sel, 0))
    np.testing.assert_allclose(np.asarray(dots), ref_dots, atol=2e-1)
