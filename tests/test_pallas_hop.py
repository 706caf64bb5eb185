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
