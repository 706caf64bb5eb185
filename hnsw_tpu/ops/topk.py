"""Top-k selection and streaming merge.

The reference's per-query PriorityQueue pair (candidates min-heap + bounded
nearest max-heap; ultra_fast.clj:151-212) and its global Collections/sort
merges (partitioned_hnsw.clj:187-196) become masked `lax.top_k` over batch
tiles, plus a streaming tile-merge for corpora too large to score in one shot.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hnsw_tpu.ops.distance import BIG


def mask_invalid(dists: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(valid, dists, BIG)


def top_k_ascending(dists: jnp.ndarray, k: int):
    """Smallest-k along the last axis. Returns (dists [.., k], idx [.., k])."""
    neg, idx = jax.lax.top_k(-dists, k)
    return -neg, idx


def merge_topk(dists_a, ids_a, dists_b, ids_b, k: int):
    """Merge two ascending top-k candidate sets (concat + reselect)."""
    d = jnp.concatenate([dists_a, dists_b], axis=-1)
    i = jnp.concatenate([ids_a, ids_b], axis=-1)
    dk, sel = top_k_ascending(d, k)
    return dk, jnp.take_along_axis(i, sel, axis=-1)


@partial(jax.jit, static_argnames=("k",))
def dedupe_ascending(dists: jnp.ndarray, ids: jnp.ndarray, k: int):
    """Drop duplicate ids from an ascending candidate list, keeping the first
    (best) occurrence, then reselect top-k. ids: [..., C] int32; duplicates
    get distance BIG. Used when merging per-partition / per-probe results that
    may contain the same row (reference dedupes LSH hits by id:
    hybrid_lsh.clj:330-342)."""
    # mark entry j duplicate if any earlier entry i<j has the same id
    eq = ids[..., None, :] == ids[..., :, None]          # [..., C, C]
    c = ids.shape[-1]
    earlier = jnp.tril(jnp.ones((c, c), dtype=bool), k=-1)
    dup = jnp.any(eq & earlier, axis=-1)
    d = jnp.where(dup, BIG, dists)
    dk, sel = top_k_ascending(d, k)
    return dk, jnp.take_along_axis(ids, sel, axis=-1)
