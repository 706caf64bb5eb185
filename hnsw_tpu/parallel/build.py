"""Sharded index CONSTRUCTION over the device mesh.

The reference prototyped parallel per-partition HNSW builds on a host thread
pool (wip/partitioned.clj:43-102 — one Callable per partition) but shipped
the sequential loop (partitioned_hnsw.clj:100-119). The TPU recast: the P
sub-graph builds are the SAME program over stacked arrays, so each layer of
the whole partitioned index builds as ONE mesh dispatch — `shard_map` lays
partitions over chips, `vmap` runs the fused layer builder
(models/hnsw/build._layer_fused: exact-kNN candidates -> selection heuristic
-> reverse edges -> re-prune) on every local partition at once. Host work is
limited to the shuffle/split bookkeeping and the tiny top layers.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hnsw_tpu.config import DEFAULTS
from hnsw_tpu.models.common import as_corpus
from hnsw_tpu.models.hnsw.build import (
    BUILD_TILE, HOST_LAYER_MAX, _build_layer_host, _layer_fused,
    _pow2_at_least,
)
from hnsw_tpu.models.hnsw.graph import NONE, assign_levels
from hnsw_tpu.models.partitioned import PartitionedHNSWIndex


def _stacked_layer(mesh: Mesh, axis: str, vecs_p, mem_idx_p, n_p, *,
                   cap: int, kq: int, tile: int, metric, precision: str):
    """One layer of every partition in one mesh dispatch.

    vecs_p:    [P, S_pad, D]  partition-stacked sub-corpora (sharded on P)
    mem_idx_p: [P, SL_pad]    partition-LOCAL indices of this layer's members
                              (-1 pad; identity iota for layer 0)
    n_p:       [P]            member count per partition
    Returns adjacency [P, SL_pad, cap] of partition-local indices (-1 pad).
    """

    def body(vecs_l, mem_l, n_l):
        def one(vecs, mem, nn):
            sub = jnp.take(vecs, jnp.maximum(mem, 0), axis=0)
            live = (jnp.arange(sub.shape[0]) < nn)[:, None]
            sub = jnp.where(live, sub, 0.0)
            out = _layer_fused(sub, nn, cap=cap, kq=kq, metric=metric,
                               tile=tile, precision=precision)
            # member-local -> partition-local row ids
            return jnp.where(out >= 0, jnp.take(mem, jnp.maximum(out, 0)),
                             NONE)
        return jax.vmap(one)(vecs_l, mem_l, n_l)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(vecs_p, mem_idx_p, n_p)


def build_partitioned_hnsw_sharded(
    data,
    *,
    num_partitions: Optional[int] = None,   # default: mesh size
    mesh: Optional[Mesh] = None,
    M: int = DEFAULTS["M"],
    max_M0: Optional[int] = None,
    ef_construction: int = 50,   # reference value (partitioned_hnsw.clj:109)
    metric="cosine",
    ids=None,
    seed: int = DEFAULTS["seed"],
    shuffle: bool = True,
    k_cand: Optional[int] = None,
    build_precision: str = "auto",
    **_ignored,
) -> PartitionedHNSWIndex:
    """Build a PartitionedHNSWIndex with the partition axis laid over the
    mesh: every graph layer is one collective-free shard_map dispatch (each
    chip builds its local partitions' layer with the fused exact-kNN
    builder). The returned index's stacked arrays are ALREADY sharded over
    the mesh, so wrapping it in ShardedPartitionedHNSW is free."""
    corpus = as_corpus(data, metric=metric, ids=ids)
    if mesh is None:
        from hnsw_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    dcount = int(mesh.devices.size)
    n = corpus.n
    p = num_partitions or dcount
    if p % dcount:
        raise ValueError(f"num_partitions {p} not divisible by mesh size "
                         f"{dcount}")
    m0 = max_M0 or 2 * M
    ml = 1.0 / math.log(2.0)
    k_cand = k_cand or min(max(2 * m0, 48), 192)
    chunk = max((n + p - 1) // p, 1)
    if build_precision == "auto":
        build_precision = "highest" if chunk <= 50000 else "bf16"

    rng = np.random.default_rng(seed)
    order = (rng.permutation(n) if shuffle else
             np.arange(n)).astype(np.int32)
    s_pad = _pow2_at_least(chunk, 8)

    rows_p = np.full((p, s_pad), NONE, np.int32)
    counts = np.zeros(p, np.int32)
    levels_p = np.full((p, s_pad), NONE, np.int32)
    for i in range(p):
        rows = order[i * chunk:(i + 1) * chunk]
        rows_p[i, : len(rows)] = rows
        counts[i] = len(rows)
        if len(rows):
            cap_l = max(int(math.log2(max(len(rows), 2))), 1)
            levels_p[i, : len(rows)] = assign_levels(
                len(rows), ml, seed + i, max_cap=cap_l)
    max_level = int(levels_p.max()) if n else 0

    host = np.asarray(corpus.vectors)
    sq = np.asarray(corpus.sq_norms)
    vecs_np = np.zeros((p, s_pad, corpus.d_pad), np.float32)
    vsq_np = np.zeros((p, s_pad), np.float32)
    ok = rows_p >= 0
    vecs_np[ok] = host[rows_p[ok]]
    vsq_np[ok] = sq[rows_p[ok]]

    shard = NamedSharding(mesh, P(axis))
    vecs_dev = jax.device_put(jnp.asarray(vecs_np), shard)
    counts_dev = jax.device_put(jnp.asarray(counts), shard)

    tile = min(BUILD_TILE, s_pad)

    # ---- layer 0: members = every local row -----------------------------
    ident = jax.device_put(
        jnp.broadcast_to(jnp.arange(s_pad, dtype=jnp.int32)[None, :],
                         (p, s_pad)), shard)
    adj0_dev = _stacked_layer(
        mesh, axis, vecs_dev, ident, counts_dev,
        cap=m0, kq=min(k_cand + 1, s_pad), tile=tile,
        metric=corpus.metric, precision=build_precision)

    # ---- upper layers ----------------------------------------------------
    adj_upper_np = np.full((p, max(max_level, 0), s_pad, M), NONE, np.int32)
    for l in range(1, max_level + 1):
        at = levels_p >= l
        mem_counts = at.sum(axis=1).astype(np.int32)
        mx = int(mem_counts.max()) if p else 0
        if mx <= 1:
            continue
        if mx <= HOST_LAYER_MAX:
            # tiny routing layers: numpy per partition, zero device compiles
            for i in range(p):
                mem = np.nonzero(at[i])[0].astype(np.int32)
                if len(mem) <= 1:
                    continue
                x = vecs_np[i, mem][:, : corpus.dim]
                outl = _build_layer_host(x, cap=M,
                                         k_cand=min(k_cand, 4 * M),
                                         metric=corpus.metric)
                adj_upper_np[i, l - 1, mem] = np.where(
                    outl >= 0, mem[np.maximum(outl, 0)], NONE)
            continue
        sl_pad = _pow2_at_least(mx, 8)
        mem_idx = np.full((p, sl_pad), NONE, np.int32)
        for i in range(p):
            mem = np.nonzero(at[i])[0].astype(np.int32)
            mem_idx[i, : len(mem)] = mem
        out = _stacked_layer(
            mesh, axis, vecs_dev, jax.device_put(jnp.asarray(mem_idx), shard),
            jax.device_put(jnp.asarray(mem_counts), shard),
            cap=M, kq=min(min(k_cand, 4 * M) + 1, sl_pad),
            tile=min(tile, sl_pad),
            metric=corpus.metric, precision=build_precision)
        out = np.asarray(out)
        for i in range(p):
            mem = mem_idx[i, : mem_counts[i]]
            adj_upper_np[i, l - 1, mem] = out[i, : mem_counts[i]]

    # entry per partition: first node at the partition's own top level
    entries = np.full(p, NONE, np.int32)
    for i in range(p):
        if counts[i]:
            lv = levels_p[i, : counts[i]]
            entries[i] = int(np.argmax(lv))   # first max-level node

    # [P, L, S, M] -> index layout [P, L, S, M] matches partitioned.py's
    # adj_upper_p convention
    return PartitionedHNSWIndex(
        corpus, num_partitions=p,
        vectors_p=vecs_dev,
        v_sq_p=jax.device_put(jnp.asarray(vsq_np), shard),
        rows_p=jax.device_put(jnp.asarray(rows_p), shard),
        adj0_p=adj0_dev,
        adj_upper_p=jax.device_put(jnp.asarray(adj_upper_np), shard),
        entries_p=jax.device_put(jnp.asarray(entries), shard),
        m=M, m0=m0, ef_construction=ef_construction, seed=seed)
