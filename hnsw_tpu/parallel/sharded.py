"""Sharded search over a device mesh.

Two shardings, mirroring the reference's two parallel axes (SURVEY.md §2.5):

* corpus-row sharding (ShardedFlatIndex): each chip owns a contiguous row
  slab of the packed matrix, scores it locally with the fused GEMM, and the
  k-merge is an `all_gather` of [B, k] candidates over ICI + a local
  reselect — the TPU version of partitioned_hnsw.clj:182-196's
  barrier + Collections/sort.

* partition sharding (ShardedPartitionedHNSW): the stacked per-partition
  HNSW graphs of hnsw_tpu.models.partitioned distribute over the mesh axis;
  each chip beam-searches its local partitions (vmap), then the same
  all-gather merge.

Everything runs under `jax.shard_map` so XLA lays the collectives on ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hnsw_tpu.config import Mode, adaptive_k_per_partition, ef_for
from hnsw_tpu.models.hnsw.search import hnsw_search_batch
from hnsw_tpu.ops.distance import BIG, distances_from_dots
from hnsw_tpu.ops.topk import dedupe_ascending, top_k_ascending
from hnsw_tpu.types import Corpus, Metric, round_up


# ---------------------------------------------------------------------------
# corpus-row sharded exact search
# ---------------------------------------------------------------------------

def _local_exact(vectors_l, v_sq_l, rows_l, queries, *, k, metric, axis):
    """Per-chip body: score the local slab, emit local top-k, all-gather,
    reselect. rows_l carries global row ids (-1 for padding)."""
    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    dots = jnp.dot(queries, vectors_l.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    dist = distances_from_dots(dots, q_sq, v_sq_l, metric)
    dist = jnp.where((rows_l >= 0)[None, :], dist, BIG)
    kk = min(k, vectors_l.shape[0])
    d_loc, pos = top_k_ascending(dist, kk)
    r_loc = jnp.where(d_loc < BIG, jnp.take(rows_l, pos), -1)
    # ICI merge: gather every chip's candidates, reselect locally
    # (replicated output on all chips)
    all_d = jax.lax.all_gather(d_loc, axis)          # [D, B, kk]
    all_r = jax.lax.all_gather(r_loc, axis)
    b = queries.shape[0]
    all_d = jnp.moveaxis(all_d, 0, 1).reshape(b, -1)
    all_r = jnp.moveaxis(all_r, 0, 1).reshape(b, -1)
    dk, sel = top_k_ascending(all_d, min(k, all_d.shape[-1]))
    rk = jnp.take_along_axis(all_r, sel, axis=-1)
    rk = jnp.where(dk < BIG, rk, -1)
    if dk.shape[-1] < k:
        pad = k - dk.shape[-1]
        dk = jnp.pad(dk, ((0, 0), (0, pad)), constant_values=1e30)
        rk = jnp.pad(rk, ((0, 0), (0, pad)), constant_values=-1)
    return dk, rk


def sharded_exact_topk(mesh: Mesh, vectors, v_sq, rows, queries, *,
                       k: int, metric: Metric, axis: Optional[str] = None):
    """vectors/v_sq/rows sharded on dim 0 over `axis`; queries replicated.
    Returns replicated (dists [B, k], global rows [B, k])."""
    axis = axis or mesh.axis_names[0]
    fn = jax.shard_map(
        partial(_local_exact, k=k, metric=metric, axis=axis),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        # outputs are replicated by construction (post-all_gather reselect);
        # the static varying-axes checker cannot infer that
        check_vma=False,
    )
    return fn(vectors, v_sq, rows, queries)


class ShardedFlatIndex:
    """Exact search with the corpus row-sharded across chips."""

    def __init__(self, corpus: Corpus, mesh: Optional[Mesh] = None):
        from hnsw_tpu.parallel.mesh import make_mesh
        self.corpus = corpus
        self.mesh = mesh or make_mesh()
        self.axis = self.mesh.axis_names[0]
        d = self.mesh.devices.size
        n_pad = round_up(corpus.n_pad, d * 8)
        host = np.zeros((n_pad, corpus.d_pad), np.float32)
        host[: corpus.n_pad] = np.asarray(corpus.vectors)
        sq = np.zeros(n_pad, np.float32)
        sq[: corpus.n_pad] = np.asarray(corpus.sq_norms)
        rows = np.full(n_pad, -1, np.int32)
        rows[: corpus.n] = np.arange(corpus.n)
        shard = NamedSharding(self.mesh, P(self.axis))
        self.vectors = jax.device_put(jnp.asarray(host), shard)
        self.v_sq = jax.device_put(jnp.asarray(sq), shard)
        self.rows = jax.device_put(jnp.asarray(rows), shard)

    def search_batch(self, queries, k: int, mode: Mode = Mode.BALANCED):
        q = self.corpus.pad_queries(queries)
        return sharded_exact_topk(self.mesh, self.vectors, self.v_sq,
                                  self.rows, q, k=k,
                                  metric=self.corpus.metric, axis=self.axis)


# ---------------------------------------------------------------------------
# data-parallel k-means training step (the framework's "training loop")
# ---------------------------------------------------------------------------

def _local_lloyd(vectors_l, v_sq_l, valid_l, centroids, *, metric, axis):
    """One Lloyd iteration with the corpus row-sharded: local assignment
    GEMM + one-hot partial sums, psum over ICI, replicated centroid update —
    the distributed form of ops/kmeans.lloyd (ivf_flat.clj:92-131)."""
    c_sq = jnp.sum(centroids * centroids, axis=-1)
    dots = jnp.dot(vectors_l, centroids.T, preferred_element_type=jnp.float32)
    dist = distances_from_dots(dots, v_sq_l[:, None], c_sq[None, :], metric)
    assign = jnp.argmin(dist, axis=-1)
    onehot = jax.nn.one_hot(assign, centroids.shape[0], dtype=jnp.float32)
    onehot = onehot * valid_l[:, None]
    counts = jax.lax.psum(jnp.sum(onehot, axis=0), axis)
    sums = jax.lax.psum(
        jnp.dot(onehot.T, vectors_l, preferred_element_type=jnp.float32), axis)
    new = jnp.where(counts[:, None] > 0,
                    sums / jnp.maximum(counts[:, None], 1.0), centroids)
    return new, jnp.where(valid_l, assign.astype(jnp.int32), -1)


def sharded_lloyd_step(mesh: Mesh, vectors, v_sq, valid, centroids, *,
                       metric: Metric, axis: Optional[str] = None):
    """vectors/v_sq/valid sharded on dim 0; centroids replicated. Returns
    (new centroids replicated, local assignments sharded)."""
    axis = axis or mesh.axis_names[0]
    fn = jax.shard_map(
        partial(_local_lloyd, metric=metric, axis=axis),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(axis)),
        check_vma=False,
    )
    return fn(vectors, v_sq, valid, centroids)


# ---------------------------------------------------------------------------
# cluster-sharded IVF / Lightning slab scan
# ---------------------------------------------------------------------------

def _local_ivf(slabs_l, slab_sq_l, slab_rows_l, lens_l, mask_l, queries, *,
               k, kk, metric, axis):
    """Per-chip body: scan the local clusters' stacked slabs ([K_loc, cmax,
    D]) against the whole query batch, keep a running top-kk, then the same
    ICI all-gather + reselect merge as the flat path. mask_l is the local
    column block of the [B, K] probe mask."""
    b = queries.shape[0]
    cmax = slabs_l.shape[1]
    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)

    def step(carry, c):
        best_d, best_r = carry
        local = jax.lax.broadcasted_iota(jnp.int32, (1, cmax), 1)
        valid = (local < lens_l[c]) & (slab_rows_l[c][None, :] >= 0)
        dots = jnp.dot(queries, slabs_l[c].T,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        dist = distances_from_dots(dots, q_sq, slab_sq_l[c], metric)
        dist = jnp.where(valid & mask_l[:, c][:, None], dist, BIG)
        d_all = jnp.concatenate([best_d, dist], axis=-1)
        r_all = jnp.concatenate(
            [best_r,
             jnp.broadcast_to(slab_rows_l[c][None, :], (b, cmax))], axis=-1)
        dk, sel = top_k_ascending(d_all, kk)
        return (dk, jnp.take_along_axis(r_all, sel, axis=-1)), None

    init = (jnp.full((b, kk), BIG), jnp.full((b, kk), -1, jnp.int32))
    (d_loc, r_loc), _ = jax.lax.scan(step, init,
                                     jnp.arange(slabs_l.shape[0]))
    all_d = jnp.moveaxis(jax.lax.all_gather(d_loc, axis), 0, 1).reshape(b, -1)
    all_r = jnp.moveaxis(jax.lax.all_gather(r_loc, axis), 0, 1).reshape(b, -1)
    dk, rk = dedupe_ascending(all_d, all_r, min(k, all_d.shape[-1]))
    rk = jnp.where(dk < BIG, rk, -1)
    if dk.shape[-1] < k:
        pad = k - dk.shape[-1]
        dk = jnp.pad(dk, ((0, 0), (0, pad)), constant_values=1e30)
        rk = jnp.pad(rk, ((0, 0), (0, pad)), constant_values=-1)
    return dk, rk


class ShardedIVFFlat:
    """An IVF-FLAT (or Lightning) index with its CLUSTER axis laid over the
    mesh — the distributed form of the reference's probes-across-threads
    (ivf_flat.clj:281-288). Each chip owns K/D clusters as a stacked
    [K_loc, cmax, D] slab tensor; a search probes centroids (replicated,
    tiny), scans local slabs, and merges candidates over ICI."""

    def __init__(self, index, mesh: Optional[Mesh] = None):
        from hnsw_tpu.parallel.mesh import make_mesh
        t = index.table
        self.inner = index
        self.mesh = mesh or make_mesh()
        self.axis = self.mesh.axis_names[0]
        d = int(self.mesh.devices.size)
        k_parts = t.k_parts
        self.k_pad = round_up(k_parts, d)
        cmax = t.cmax

        host_vec = np.asarray(t.vectors)
        host_sq = np.asarray(t.v_sq)
        host_perm = np.asarray(t.perm)
        starts = np.asarray(t.starts)
        lens = np.asarray(t.lens)
        slabs = np.zeros((self.k_pad, cmax, host_vec.shape[1]), np.float32)
        slab_sq = np.zeros((self.k_pad, cmax), np.float32)
        slab_rows = np.full((self.k_pad, cmax), -1, np.int32)
        for c in range(k_parts):
            s, ln = int(starts[c]), int(lens[c])
            slabs[c, :ln] = host_vec[s:s + ln]
            slab_sq[c, :ln] = host_sq[s:s + ln]
            slab_rows[c, :ln] = host_perm[s:s + ln]
        lens_pad = np.zeros(self.k_pad, np.int32)
        lens_pad[:k_parts] = lens

        shard = NamedSharding(self.mesh, P(self.axis))
        self.slabs = jax.device_put(jnp.asarray(slabs), shard)
        self.slab_sq = jax.device_put(jnp.asarray(slab_sq), shard)
        self.slab_rows = jax.device_put(jnp.asarray(slab_rows), shard)
        self.lens = jax.device_put(jnp.asarray(lens_pad), shard)

    @property
    def corpus(self):
        return self.inner.corpus

    def search_batch(self, queries, k: int, mode: Mode = Mode.BALANCED,
                     num_probes: Optional[int] = None):
        from hnsw_tpu.config import IVF_FLAT_PROBES
        from hnsw_tpu.models._partition_scan import probe_mask_from_centroids
        q = self.corpus.pad_queries(queries)
        t = self.inner.table
        if num_probes is None:
            num_probes = IVF_FLAT_PROBES[Mode.coerce(mode)]
        mask, _ = probe_mask_from_centroids(
            q, t.centroids, num_probes=min(num_probes, t.k_parts),
            metric=self.corpus.metric)
        if self.k_pad > t.k_parts:   # padding clusters are never probed
            mask = jnp.pad(mask, ((0, 0), (0, self.k_pad - t.k_parts)))
        # spilled tables store a row in up to two slabs (possibly on
        # different chips): carry 2k locally so k unique survive the dedupe
        kk = 2 * k if getattr(self.inner, "spill", 0) else k
        fn = jax.shard_map(
            partial(_local_ivf, k=k, kk=kk, metric=self.corpus.metric,
                    axis=self.axis),
            mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis), P(self.axis),
                      P(self.axis), P(None, self.axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(self.slabs, self.slab_sq, self.slab_rows, self.lens,
                  mask, q)


# ---------------------------------------------------------------------------
# partition-sharded HNSW
# ---------------------------------------------------------------------------

def _local_partitions(vecs_p, v_sq_p, rows_p, adj0_p, adju_p, entries_p,
                      queries, *, k, kpp, ef, metric, axis):
    b = queries.shape[0]

    def one(vecs, v_sq, adj0, adju, entry):
        return hnsw_search_batch(
            vecs, v_sq, adj0, adju, jnp.full((b,), entry, jnp.int32),
            queries, k=kpp, ef=ef, metric=metric)

    d_p, r_p = jax.vmap(one)(vecs_p, v_sq_p, adj0_p, adju_p, entries_p)
    rows_b = jnp.broadcast_to(rows_p[:, None, :],
                              (rows_p.shape[0], b, rows_p.shape[1]))
    g_p = jnp.where(r_p >= 0,
                    jnp.take_along_axis(rows_b, jnp.maximum(r_p, 0), axis=-1),
                    -1)
    d_loc = jnp.transpose(d_p, (1, 0, 2)).reshape(b, -1)
    g_loc = jnp.transpose(g_p, (1, 0, 2)).reshape(b, -1)
    all_d = jnp.moveaxis(jax.lax.all_gather(d_loc, axis), 0, 1).reshape(b, -1)
    all_g = jnp.moveaxis(jax.lax.all_gather(g_loc, axis), 0, 1).reshape(b, -1)
    dk, sel = top_k_ascending(all_d, min(k, all_d.shape[-1]))
    rk = jnp.take_along_axis(all_g, sel, axis=-1)
    rk = jnp.where(dk < BIG, rk, -1)
    if dk.shape[-1] < k:
        pad = k - dk.shape[-1]
        dk = jnp.pad(dk, ((0, 0), (0, pad)), constant_values=1e30)
        rk = jnp.pad(rk, ((0, 0), (0, pad)), constant_values=-1)
    return dk, rk


class ShardedPartitionedHNSW:
    """A PartitionedHNSWIndex with its partition axis laid over the mesh —
    the distributed form of the reference's 8-thread partition fan-out."""

    def __init__(self, index, mesh: Optional[Mesh] = None):
        from hnsw_tpu.parallel.mesh import make_mesh
        self.inner = index
        self.mesh = mesh or make_mesh()
        self.axis = self.mesh.axis_names[0]
        d = self.mesh.devices.size
        if index.num_partitions % d != 0:
            raise ValueError(
                f"num_partitions {index.num_partitions} not divisible by "
                f"mesh size {d}")
        shard = NamedSharding(self.mesh, P(self.axis))
        self.vectors_p = jax.device_put(index.vectors_p, shard)
        self.v_sq_p = jax.device_put(index.v_sq_p, shard)
        self.rows_p = jax.device_put(index.rows_p, shard)
        self.adj0_p = jax.device_put(index.adj0_p, shard)
        self.adj_upper_p = jax.device_put(index.adj_upper_p, shard)
        self.entries_p = jax.device_put(index.entries_p, shard)

    @property
    def corpus(self):
        return self.inner.corpus

    def search_batch(self, queries, k: int, mode: Mode = Mode.BALANCED,
                     ef: Optional[int] = None,
                     k_per_partition: Optional[int] = None):
        q = self.corpus.pad_queries(queries)
        mode = Mode.coerce(mode)
        if k_per_partition is None:
            k_per_partition = k if mode == Mode.PRECISE else \
                min(k, adaptive_k_per_partition(self.inner.num_partitions, k))
        ef = ef if ef is not None else ef_for(mode, k_per_partition)
        fn = jax.shard_map(
            partial(_local_partitions, k=k, kpp=k_per_partition, ef=ef,
                    metric=self.corpus.metric, axis=self.axis),
            mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis), P(self.axis),
                      P(self.axis), P(self.axis), P(self.axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(self.vectors_p, self.v_sq_p, self.rows_p, self.adj0_p,
                  self.adj_upper_p, self.entries_p, q)
