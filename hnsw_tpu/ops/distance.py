"""Distance scoring on the MXU.

The reference spends 70-95% of query time in scalar distance loops
(reference README.md:13) and attacks that with Java Vector API SIMD
(src/hnsw/simd.clj:18-115: fused single-pass dot+norms cosine, unrolled L2).
On TPU all of those collapse into one shape: a query-block x corpus-block
matmul producing a dot tile, combined with precomputed squared norms
(the reference precomputes norms too — ivf_flat.clj:161-179) to yield
cosine / euclidean / dot distances without a second pass over the data.
The never-realized JBLAS "GEMM batching" idea in the reference
(README.md:52-57, deps.edn:6 — declared, never called) is exactly what
this module actually does.

Distances are ascending-better:
  cosine    -> 1 - dot / (|q||v|)       in [0, 2]
  euclidean -> sqrt(|q|^2 + |v|^2 - 2 dot)
  dot       -> -dot
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hnsw_tpu.types import Metric

# Large-but-finite sentinel: padding rows / masked candidates sort last but
# never produce NaN/inf arithmetic.
BIG = jnp.float32(1e30)
_EPS = 1e-12


def distances_from_dots(
    dots: jnp.ndarray,
    q_sq: jnp.ndarray,
    v_sq: jnp.ndarray,
    metric: Metric,
) -> jnp.ndarray:
    """Convert a dot-product tile [B, N] + squared norms into distances.

    q_sq: [B] or [B, 1]; v_sq: [N] or [1, N].
    """
    q_sq = q_sq.reshape(q_sq.shape[0] if q_sq.ndim else 1, 1) if q_sq.ndim <= 1 else q_sq
    v_sq = v_sq.reshape(1, -1) if v_sq.ndim == 1 else v_sq
    if metric == Metric.COSINE:
        denom = jnp.sqrt(jnp.maximum(q_sq * v_sq, _EPS))
        return 1.0 - dots / denom
    if metric == Metric.EUCLIDEAN:
        sq = jnp.maximum(q_sq + v_sq - 2.0 * dots, 0.0)
        return jnp.sqrt(sq)
    if metric == Metric.DOT:
        return -dots
    raise ValueError(f"unknown metric {metric}")


@partial(jax.jit, static_argnames=("metric", "precision"))
def score_block(
    queries: jnp.ndarray,   # [B, D]
    vectors: jnp.ndarray,   # [N, D]
    v_sq: jnp.ndarray,      # [N]
    *,
    metric: Metric = Metric.COSINE,
    precision: str = "f32",
) -> jnp.ndarray:
    """Fused distance tile: one MXU matmul + norm combine. Returns [B, N]."""
    if precision == "bf16":
        dots = jnp.dot(queries.astype(jnp.bfloat16), vectors.astype(jnp.bfloat16).T,
                       preferred_element_type=jnp.float32)
    else:
        # full-f32 MXU passes: JAX's DEFAULT matmul precision truncates f32
        # inputs to bf16-class products, which is fine for the fast path but
        # not for exact/ground-truth scoring
        dots = jnp.dot(queries, vectors.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return distances_from_dots(dots, q_sq, v_sq, metric)


def gather_score(
    queries: jnp.ndarray,    # [B, D]
    rows: jnp.ndarray,       # [B, C] int32 candidate row ids (clipped)
    vectors: jnp.ndarray,    # [N, D]
    v_sq: jnp.ndarray,       # [N]
    *,
    metric: Metric,
    valid: jnp.ndarray | None = None,  # [B, C] bool
) -> jnp.ndarray:
    """Per-query candidate scoring: gather C rows, batched dot against the
    query. This is the TPU form of the reference's hot traversal loop
    (ultra_fast.clj:170-204: per-neighbor distance-fn call). Returns [B, C]
    distances with invalid entries set to BIG."""
    cand = jnp.take(vectors, rows, axis=0)                 # [B, C, D]
    dots = jnp.einsum("bd,bcd->bc", queries, cand,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    c_sq = jnp.take(v_sq, rows, axis=0)                    # [B, C]
    d = _dist_bc(dots, q_sq, c_sq, metric)
    if valid is not None:
        d = jnp.where(valid, d, BIG)
    return d


def _dist_bc(dots, q_sq, c_sq, metric):
    """distances_from_dots variant where norms are [B, C] (per-candidate)."""
    if metric == Metric.COSINE:
        denom = jnp.sqrt(jnp.maximum(q_sq * c_sq, _EPS))
        return 1.0 - dots / denom
    if metric == Metric.EUCLIDEAN:
        return jnp.sqrt(jnp.maximum(q_sq + c_sq - 2.0 * dots, 0.0))
    if metric == Metric.DOT:
        return -dots
    raise ValueError(f"unknown metric {metric}")


def pairwise_distances(
    a: jnp.ndarray, b: jnp.ndarray, *, metric: Metric = Metric.COSINE
) -> jnp.ndarray:
    """Small-scale all-pairs distances [A, B] (used by k-means init, tests)."""
    a_sq = jnp.sum(a * a, axis=-1)
    b_sq = jnp.sum(b * b, axis=-1)
    dots = jnp.dot(a, b.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return distances_from_dots(dots, a_sq[:, None], b_sq[None, :], metric)


def normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize rows (reference: simd_optimized.clj:188-198
    normalize-vector!)."""
    n = jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), _EPS))
    return x / n
