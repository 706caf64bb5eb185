"""Vectorized bitonic sort / top-k merge.

The classic batched bitonic network with jnp reshapes/where only — every
stage is a static lane permutation + elementwise min/max over the whole
[B, L] tile.

Hardware reality check (round-3 probe, scripts/_probe_hnsw_r3.py): inside
the HNSW hop loop on the real chip, XLA does NOT fuse the exchange stages —
each one materializes, and the network runs ~10x SLOWER than the lax.top_k
it was meant to replace (32.4 vs 3.4 ms/hop at [1024, 228]). lax.top_k is
therefore the production beam merge again (models/hnsw/search.py
_beam_merge); this module remains for contexts that can fuse the stages
(e.g. a future Pallas block where the whole network runs in VMEM) and as
the reference implementation its tests pin down.

Values ride along as one int32 payload; ties break by lane position so the
key/payload pairing stays consistent between exchange partners.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _exchange(keys, vals, stride: int, block: int):
    """One bitonic compare-exchange stage over the last axis.

    Lanes i and i^stride swap so that ascending blocks of size `block` form.
    Implemented as reshape-slice-concat (static permutation) so it lowers to
    lane shuffles, not a gather.
    """
    n = keys.shape[-1]
    lead = keys.shape[:-1]
    # partner view: swap the two halves of each 2*stride group
    k2 = keys.reshape(*lead, n // (2 * stride), 2, stride)
    v2 = vals.reshape(*lead, n // (2 * stride), 2, stride)
    pk = jnp.flip(k2, axis=-2).reshape(*lead, n)
    pv = jnp.flip(v2, axis=-2).reshape(*lead, n)

    idx = jnp.arange(n)
    is_low = (idx & stride) == 0            # lane is the low element of pair
    asc = (idx & block) == 0                # block sorts ascending
    keep_min = is_low == asc                # this lane keeps the smaller key

    # tie-break by lane position so both partners make consistent choices
    partner_low = ~is_low
    mine_smaller = (keys < pk) | ((keys == pk) & partner_low)
    take_mine = keep_min == mine_smaller

    new_k = jnp.where(take_mine, keys, pk)
    new_v = jnp.where(take_mine, vals, pv)
    return new_k, new_v


def bitonic_sort_kv(keys: jnp.ndarray, vals: jnp.ndarray):
    """Ascending sort of the last axis (power-of-two length) carrying one
    payload array. keys: [..., L] float; vals: [..., L] int32."""
    n = keys.shape[-1]
    assert n & (n - 1) == 0, f"bitonic length must be a power of two, got {n}"
    size = 2
    while size <= n:
        stride = size // 2
        while stride >= 1:
            keys, vals = _exchange(keys, vals, stride, size)
            stride //= 2
        size *= 2
    return keys, vals


def _pad_pow2(keys, vals, fill_key):
    n = keys.shape[-1]
    p = 1
    while p < n:
        p *= 2
    if p == n:
        return keys, vals
    pad = [(0, 0)] * (keys.ndim - 1) + [(0, p - n)]
    return (jnp.pad(keys, pad, constant_values=fill_key),
            jnp.pad(vals, pad, constant_values=-1))


@partial(jax.jit, static_argnames=("k",))
def bitonic_topk(keys: jnp.ndarray, vals: jnp.ndarray, k: int):
    """Smallest-k of the last axis with payload. Pads to a power of two,
    full bitonic sort, slice k. Drop-in for top_k_ascending when a payload
    is carried (avoids the take_along_axis after lax.top_k too)."""
    big = jnp.asarray(jnp.inf, keys.dtype)
    keys, vals = _pad_pow2(keys, vals, big)
    keys, vals = bitonic_sort_kv(keys, vals)
    return keys[..., :k], vals[..., :k]


@partial(jax.jit, static_argnames=("k",))
def bitonic_topk_presorted(keys_a, vals_a, keys_b, vals_b, k: int):
    """Smallest-k of [sorted run a ++ unsorted b] with payload.

    The HNSW beam merge shape: `a` (the beam) is already ascending from the
    previous merge, only `b` (the hop candidates) is unsorted. Sorting just
    b (log^2|b| stages over |b| lanes) and then one bitonic merge phase
    (log(2L)+1 stages over 2L lanes) does ~1.6x less lane-work than the full
    sort bitonic_topk runs over the concatenation. Both runs pad to a common
    power-of-two length with +inf keys / -1 payloads."""
    big = jnp.asarray(jnp.inf, keys_a.dtype)
    keys_a, vals_a = _pad_pow2(keys_a, vals_a, big)
    keys_b, vals_b = _pad_pow2(keys_b, vals_b, big)
    n = max(keys_a.shape[-1], keys_b.shape[-1])

    def grow(kx, vx):
        pad = [(0, 0)] * (kx.ndim - 1) + [(0, n - kx.shape[-1])]
        return (jnp.pad(kx, pad, constant_values=big),
                jnp.pad(vx, pad, constant_values=-1))

    keys_a, vals_a = grow(keys_a, vals_a)
    keys_b, vals_b = grow(keys_b, vals_b)
    keys_b, vals_b = bitonic_sort_kv(keys_b, vals_b)
    mk, mv = bitonic_merge_sorted(keys_a, vals_a, keys_b, vals_b)
    return mk[..., :k], mv[..., :k]


@partial(jax.jit, static_argnames=())
def bitonic_merge_sorted(keys_a, vals_a, keys_b, vals_b):
    """Merge two ascending-sorted runs of equal power-of-two length L into
    one ascending run of 2L (a single bitonic merge phase: log2(2L)+1
    stages instead of a full sort's ~log^2)."""
    n = keys_a.shape[-1]
    # reverse b so [a, reversed(b)] is bitonic
    keys = jnp.concatenate([keys_a, jnp.flip(keys_b, -1)], axis=-1)
    vals = jnp.concatenate([vals_a, jnp.flip(vals_b, -1)], axis=-1)
    size = 2 * n
    stride = size // 2
    while stride >= 1:
        keys, vals = _exchange(keys, vals, stride, size * 2)
        stride //= 2
    return keys, vals
