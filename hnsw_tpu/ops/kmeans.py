"""k-means on the MXU.

The reference's coarse quantizer: k-means++ init with D^2-weighted sampling
from a seeded Random(42) (ivf_flat.clj:32-60) and Lloyd's algorithm with a
fixed 10 iterations where an emptied cluster keeps its old centroid
(ivf_flat.clj:92-131). There the assignment step is an O(n*k*d) scalar loop;
here it is one GEMM + argmin, and the centroid update is a one-hot matmul
(segment-sum) — both MXU shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hnsw_tpu.ops.distance import BIG, distances_from_dots
from hnsw_tpu.types import Metric


def _scores(vectors, v_sq, centroids, metric, precision="highest"):
    c_sq = jnp.sum(centroids * centroids, axis=-1)
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else None
    dots = jnp.dot(vectors, centroids.T, preferred_element_type=jnp.float32,
                   precision=prec)
    return distances_from_dots(dots, v_sq[:, None], c_sq[None, :], metric)


@partial(jax.jit, static_argnames=("k", "metric"))
def kmeans_pp_init(
    vectors: jnp.ndarray,   # [N_pad, D]
    v_sq: jnp.ndarray,
    valid: jnp.ndarray,     # [N_pad] bool (False for padding rows)
    seed: jnp.ndarray,      # int32 scalar
    *,
    k: int,
    metric: Metric,
) -> jnp.ndarray:
    """Seeded k-means++ (D^2 sampling) — returns centroids [k, D]."""
    n_pad, d = vectors.shape
    key = jax.random.PRNGKey(seed)
    k0, key = jax.random.split(key)
    # first center: uniform over valid rows
    logits0 = jnp.where(valid, 0.0, -jnp.inf)
    first = jax.random.categorical(k0, logits0)
    cents = jnp.zeros((k, d), jnp.float32).at[0].set(vectors[first])

    def body(i, carry):
        cents, min_d, key = carry
        # distance to the most recent center
        last = jax.lax.dynamic_slice_in_dim(cents, i - 1, 1, axis=0)
        d_new = _scores(vectors, v_sq, last, metric)[:, 0]
        min_d = jnp.minimum(min_d, d_new)
        w = jnp.where(valid, jnp.maximum(min_d, 0.0) ** 2, 0.0)
        key, kc = jax.random.split(key)
        logits = jnp.where(valid, jnp.log(w + 1e-20), -jnp.inf)
        nxt = jax.random.categorical(kc, logits)
        cents = jax.lax.dynamic_update_slice_in_dim(
            cents, vectors[nxt][None, :], i, axis=0)
        return cents, min_d, key

    cents, _, _ = jax.lax.fori_loop(
        1, k, body, (cents, jnp.full((n_pad,), BIG), key))
    return cents


@partial(jax.jit, static_argnames=("iters", "metric"))
def lloyd(
    vectors: jnp.ndarray,     # [N_pad, D]
    v_sq: jnp.ndarray,
    valid: jnp.ndarray,       # [N_pad] bool
    centroids: jnp.ndarray,   # [K, D]
    *,
    iters: int = 10,
    metric: Metric = Metric.COSINE,
):
    """Fixed-iteration Lloyd. Returns (centroids [K, D], assign int32[N_pad])
    with assign = -1 on padding rows. Empty clusters keep their previous
    centroid (ivf_flat.clj:119-124)."""
    k = centroids.shape[0]

    def step(cents, _):
        # default (bf16-class) MXU precision: cluster assignment is a
        # coarse argmin over well-separated centroids, robust to ~1e-3
        # distance error, and HIGHEST costs 6 MXU passes per GEMM — it made
        # Lloyd ~10x the cost of the whole rest of the IVF build
        dist = _scores(vectors, v_sq, cents, metric, precision="default")
        assign = jnp.argmin(dist, axis=-1)
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        onehot = onehot * valid[:, None]
        counts = jnp.sum(onehot, axis=0)                  # [K]
        sums = jnp.dot(onehot.T, vectors,
                       preferred_element_type=jnp.float32)  # [K, D]
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0), cents)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    dist = _scores(vectors, v_sq, centroids, metric, precision="default")
    assign = jnp.where(valid, jnp.argmin(dist, axis=-1).astype(jnp.int32), -1)
    return centroids, assign


def _host_metric_dist(x: np.ndarray, c: np.ndarray,
                      metric: Metric) -> np.ndarray:
    """Distances from rows of x [S, D] to one center c [D] on host."""
    dots = x @ c
    if metric == Metric.COSINE:
        denom = np.maximum(np.linalg.norm(x, axis=1) * np.linalg.norm(c),
                           1e-12)
        return (1.0 - dots / denom).astype(np.float32)
    if metric == Metric.EUCLIDEAN:
        return np.maximum((x * x).sum(1) + c @ c - 2 * dots, 0.0)
    return (-dots).astype(np.float32)


def sampled_pp_init(vectors, n: int, *, k: int, seed: int,
                    metric: Metric, sample: int = 4096) -> jnp.ndarray:
    """Seeded k-means++ (D^2 sampling) over a uniform ROW SAMPLE, run on
    host. The device kmeans_pp_init runs k SEQUENTIAL tiny steps — at
    k=128 that is ~4-5 s of pure latency on the relay, dominating the
    whole IVF build (the Lloyd iterations are ~0.4 s); a 4k-row sample
    preserves init quality (10 Lloyd iterations wash out the residue)
    at one device fetch and a fraction of a host-second."""
    s = int(min(max(4 * k, sample), max(n, 1)))
    rng = np.random.default_rng(seed)
    rows = np.sort(rng.choice(n, size=s, replace=False)) if s < n \
        else np.arange(n)
    x = np.asarray(jnp.take(vectors, jnp.asarray(rows, np.int32), axis=0),
                   np.float32)
    cents = np.empty((k, x.shape[1]), np.float32)
    cents[0] = x[rng.integers(s)]
    min_d = _host_metric_dist(x, cents[0], metric)
    for i in range(1, k):
        w = np.maximum(min_d, 0.0) ** 2
        tot = w.sum()
        p = w / tot if tot > 0 else np.full(s, 1.0 / s)
        nxt = rng.choice(s, p=p)
        cents[i] = x[nxt]
        min_d = np.minimum(min_d, _host_metric_dist(x, cents[i], metric))
    return jnp.asarray(cents)


def train_kmeans(vectors, v_sq, n: int, *, k: int, seed: int = 42,
                 iters: int = 10, metric: Metric = Metric.COSINE,
                 init: str = "sample_pp"):
    """Full pipeline: k-means++ init then Lloyd. Host-friendly wrapper.
    init: "sample_pp" (host ++ over a row sample — default; see
    sampled_pp_init) or "device_pp" (the all-device sequential init)."""
    n_pad = vectors.shape[0]
    valid = jnp.arange(n_pad) < n
    if init == "device_pp":
        cents = kmeans_pp_init(vectors, v_sq, valid, jnp.int32(seed),
                               k=k, metric=metric)
    else:
        cents = sampled_pp_init(vectors, n, k=k, seed=seed, metric=metric)
    return lloyd(vectors, v_sq, valid, cents, iters=iters, metric=metric)


@partial(jax.jit, static_argnames=("c", "metric"))
def _topc_chunk(chunk, chunk_sq, centroids, *, c: int, metric: Metric):
    # default precision: centroid ranking for probe/assignment candidates
    # is coarse (HIGHEST's 6 MXU passes cost ~6.5 TFLOP at 500k x 707)
    dist = _scores(chunk, chunk_sq, centroids, metric, precision="default")
    neg, ids = jax.lax.top_k(-dist, c)
    return -neg, ids


def topc_clusters(vectors, v_sq, n: int, centroids, *,
                  c: int = 4, metric: Metric = Metric.COSINE,
                  chunk: int = 65536):
    """Per-row c nearest centroids (ascending). Row-chunked so the [n, K]
    distance tile never materializes for large corpora. Returns host arrays
    (dists [n, c], ids [n, c])."""
    k = centroids.shape[0]
    c = min(c, k)
    n_pad = vectors.shape[0]
    out_d = np.empty((n, c), np.float32)
    out_i = np.empty((n, c), np.int32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        ln = e - s
        lpad = int(min(n_pad - s, chunk))
        d, i = _topc_chunk(
            jax.lax.dynamic_slice_in_dim(vectors, s, lpad, 0),
            jax.lax.dynamic_slice_in_dim(v_sq, s, lpad, 0),
            centroids, c=c, metric=metric)
        out_d[s:e] = np.asarray(d)[:ln]
        out_i[s:e] = np.asarray(i)[:ln]
    return out_d, out_i


def balanced_assign(dist: np.ndarray, cand: np.ndarray, k: int,
                    cap: int, rounds: int = 4) -> np.ndarray:
    """Capacity-constrained assignment from per-row candidate clusters.

    dist/cand: [n, C] ascending candidate distances / cluster ids (from
    topc_clusters). Round-based spill: every round, clusters over `cap`
    keep their cap highest-eviction-cost rows (cost = distance increase of
    moving to the row's next candidate) and evict the rest to that next
    candidate. Leftovers after `rounds` go to the least-loaded cluster.
    Balance is what makes slab widths (cmax) — and thus the grouped-scan
    compute — predictable; the reference's k-means has no such constraint
    and its README's partition-size skew shows it (ivf_flat.clj:119-131).
    """
    n, c_width = cand.shape
    assign = cand[:, 0].astype(np.int64).copy()
    choice = np.zeros(n, np.int64)
    nxt = np.minimum(choice + 1, c_width - 1)
    for _ in range(rounds):
        counts = np.bincount(assign, minlength=k)
        if (counts <= cap).all():
            break
        cost = dist[np.arange(n), nxt] - dist[np.arange(n), choice]
        # exhausted candidate lists never evict (cost inf)
        cost = np.where(choice >= c_width - 1, np.inf, cost)
        # rank rows within their cluster by cost DESC (keep costly-to-move)
        order = np.lexsort((-cost, assign))
        a_sorted = assign[order]
        first = np.searchsorted(a_sorted, a_sorted, side="left")
        pos = np.arange(n) - first
        evict = np.zeros(n, bool)
        evict[order[pos >= cap]] = True
        evict &= np.isfinite(cost)
        choice = np.where(evict, nxt, choice)
        assign = cand[np.arange(n), choice].astype(np.int64)
        nxt = np.minimum(choice + 1, c_width - 1)
    # force-fix any residual overflow: move excess rows to least-loaded
    counts = np.bincount(assign, minlength=k)
    if (counts > cap).any():
        order = np.lexsort((dist[np.arange(n), choice], assign))
        a_sorted = assign[order]
        first = np.searchsorted(a_sorted, a_sorted, side="left")
        pos = np.arange(n) - first
        excess_rows = order[pos >= cap]
        for r in excess_rows:
            tgt = int(np.argmin(counts))
            counts[assign[r]] -= 1
            assign[r] = tgt
            counts[tgt] += 1
    return assign.astype(np.int32)


def spill_assign(primary: np.ndarray, dist: np.ndarray, cand: np.ndarray,
                 k: int, cap: int) -> np.ndarray:
    """Secondary (SOAR-style multi-assignment) cluster per row: the nearest
    candidate different from the primary, capped per cluster (overflow rows
    get -1 = no spill — redundancy only, never correctness). Spilling stores
    each row in 2 clusters so a missed primary probe can still find it."""
    n, c_width = cand.shape
    is_primary = cand == primary[:, None]
    # first candidate != primary
    sec_choice = np.argmax(~is_primary, axis=1)
    has = ~is_primary[np.arange(n), sec_choice]
    secondary = np.where(has, cand[np.arange(n), sec_choice], -1).astype(np.int64)
    sec_dist = np.where(has, dist[np.arange(n), sec_choice], np.inf)
    # cap per cluster: keep closest rows
    ok = secondary >= 0
    order = np.lexsort((sec_dist, secondary))
    s_sorted = secondary[order]
    first = np.searchsorted(s_sorted, s_sorted, side="left")
    pos = np.arange(n) - first
    drop = np.zeros(n, bool)
    drop[order] = pos >= cap
    secondary[drop | ~ok] = -1
    return secondary.astype(np.int32)


def random_partition(n: int, k: int, seed: int = 42,
                     shuffle: bool = True) -> np.ndarray:
    """Random equal split — the reference's :random partitioning
    (ivf_flat.clj:191-195, lightning.clj:125-129), with the shuffle that
    partitioned HNSW documents as critical for ordered corpora
    (partitioned_hnsw.clj:75-86). Returns assign [n] int32."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(n) if shuffle else np.arange(n)
    assign = np.empty(n, np.int32)
    # contiguous equal chunks over the shuffled order
    bounds = np.linspace(0, n, k + 1).astype(np.int64)
    for c in range(k):
        assign[order[bounds[c]:bounds[c + 1]]] = c
    return assign
