"""Pallas fused exact-scan kernel: distance + streaming top-k.

The XLA flat path materializes the [B, N] score matrix in HBM and then runs
a top-k pass over it — at 31k x 768 and B=1024 that is ~260 MB of HBM
traffic beyond the corpus read itself. This kernel fuses the reference's
entire hot path (SIMD distance loop + bounded nearest-heap,
simd_optimized.clj:200-216 / ultra_fast.clj:151-212) into MXU tiles: each
grid step loads one corpus tile into VMEM, computes the distance tile on the
MXU, extracts the tile's top-k with k masked min/argmin sweeps on the VPU,
and merges into a running per-query top-k that lives in VMEM across the
corpus-tile grid dimension. Scores never touch HBM.

Grid: (B_tiles, N_tiles), N innermost; the output block index map is
constant over the N dimension, so Mosaic keeps the running top-k resident
in VMEM and only spills it once per query tile.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hnsw_tpu.types import Metric, round_up

# plain python float: jnp scalars would be captured as traced constants
# inside the pallas kernel
BIG = 1e30

# tile sizes: V tile bf16 (1024x768->1.5MB) + Q tile (512x768) + score tile
# (512x1024 f32 = 2MB) fit VMEM with double buffering
DEFAULT_BT = 512
DEFAULT_NT = 1024
# int8 bucket-kernel tiles: int8 corpus tiles are half the bytes, and the
# geometry sweep (scripts/_probe_r4h.py, three pool windows) put small query
# tiles with deep corpus tiles consistently ~6-7% ahead of 1024x1024
# (bt=512/nt=1024 hits a pathological 7x Mosaic cliff — avoid)
INT8_BT = 256
INT8_NT = 2048
# lane-aligned top-k slot width
KPAD = 128


INT_BIG = 2 ** 30


def _tile_topk(dist: jnp.ndarray, rows: jnp.ndarray, k: int):
    """k masked min sweeps over [BT, NT]. Gather-free: row ids are unique
    within a tile, so the winner is selected and masked by row id (Mosaic
    has no general gather). Returns ([BT, k], [BT, k])."""
    ds, rs = [], []
    for _ in range(k):
        m = jnp.min(dist, axis=1, keepdims=True)            # [BT, 1]
        is_min = dist == m
        r = jnp.min(jnp.where(is_min, rows, INT_BIG), axis=1, keepdims=True)
        ds.append(m)
        rs.append(jnp.where(r == INT_BIG, -1, r))
        dist = jnp.where(rows == r, BIG, dist)
    return jnp.concatenate(ds, axis=1), jnp.concatenate(rs, axis=1)


def _make_kernel(k: int, nt: int, metric: Metric, n_tiles: int):
    def kernel(n_ref, q_ref, v_ref, vsq_ref, outd_ref, outi_ref):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _():
            outd_ref[:] = jnp.full(outd_ref.shape, BIG, jnp.float32)
            outi_ref[:] = jnp.full(outi_ref.shape, -1, jnp.int32)

        q = q_ref[:]                                       # [BT, D]
        v = v_ref[:]                                       # [NT, D]
        dots = jnp.dot(q, v.T, preferred_element_type=jnp.float32)
        q_sq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        v_sq = vsq_ref[:].reshape(1, nt)
        if metric == Metric.COSINE:
            denom = jnp.sqrt(jnp.maximum(q_sq * v_sq, 1e-12))
            dist = 1.0 - dots / denom
        elif metric == Metric.EUCLIDEAN:
            dist = jnp.sqrt(jnp.maximum(q_sq + v_sq - 2.0 * dots, 0.0))
        else:
            dist = -dots
        base = ti * nt
        rows = base + jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        dist = jnp.where(rows < n_ref[0], dist, BIG)

        tile_d, tile_r = _tile_topk(dist, rows, k)         # [BT, k]

        # merge with the running top-k (slots 0..k-1 of the padded out block)
        run_d = outd_ref[:, :k]
        run_r = outi_ref[:, :k]
        cand_d = jnp.concatenate([run_d, tile_d], axis=1)  # [BT, 2k]
        cand_r = jnp.concatenate([run_r, tile_r], axis=1)
        mer_d, mer_r = _merge_sorted(cand_d, cand_r, k)
        outd_ref[:, :k] = mer_d
        outi_ref[:, :k] = jnp.where(mer_d < BIG, mer_r, -1)

    return kernel


def _merge_sorted(cand_d: jnp.ndarray, cand_r: jnp.ndarray, k: int):
    """Ascending k smallest of [BT, 2k] pairs via k min sweeps; gather-free
    selection by (unique) row id. Invalid slots carry row -1 and dist BIG,
    which can never win against any valid candidate."""
    ds, rs = [], []
    rows = jnp.where(cand_r >= 0, cand_r, INT_BIG)
    for _ in range(k):
        m = jnp.min(cand_d, axis=1, keepdims=True)
        is_min = cand_d == m
        r = jnp.min(jnp.where(is_min, rows, INT_BIG), axis=1, keepdims=True)
        ds.append(m)
        rs.append(jnp.where(r == INT_BIG, -1, r))
        kill = (rows == r) & is_min
        cand_d = jnp.where(kill, BIG, cand_d)
        rows = jnp.where(kill, INT_BIG, rows)
    return jnp.concatenate(ds, axis=1), jnp.concatenate(rs, axis=1)


@partial(jax.jit, static_argnames=("k", "metric", "bt", "nt", "interpret"))
def pallas_exact_topk(
    vectors: jnp.ndarray,   # [N_pad, D] (bf16 or f32; N_pad % nt == 0)
    v_sq: jnp.ndarray,      # [N_pad] f32
    queries: jnp.ndarray,   # [B, D] (same dtype as vectors; B % bt == 0)
    n,                      # valid row count (traced)
    *,
    k: int,
    metric: Metric,
    bt: int = DEFAULT_BT,
    nt: int = DEFAULT_NT,
    interpret: bool = False,
):
    """Fused scan. Returns (dists f32[B, k], rows int32[B, k])."""
    n_pad, d = vectors.shape
    b = queries.shape[0]
    assert n_pad % nt == 0 and b % bt == 0, (n_pad, nt, b, bt)
    n_tiles = n_pad // nt
    b_tiles = b // bt
    n_arr = jnp.full((1,), n, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((bt, d), lambda bi, ti, n_ref: (bi, 0)),
            pl.BlockSpec((nt, d), lambda bi, ti, n_ref: (ti, 0)),
            pl.BlockSpec((nt,), lambda bi, ti, n_ref: (ti,)),
        ],
        out_specs=[
            pl.BlockSpec((bt, KPAD), lambda bi, ti, n_ref: (bi, 0)),
            pl.BlockSpec((bt, KPAD), lambda bi, ti, n_ref: (bi, 0)),
        ],
    )
    outd, outi = pl.pallas_call(
        _make_kernel(k, nt, metric, n_tiles),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, KPAD), jnp.float32),
            jax.ShapeDtypeStruct((b, KPAD), jnp.int32),
        ],
        interpret=interpret,
    )(n_arr, queries, vectors, v_sq)
    return outd[:, :k], outi[:, :k]


def supported(k: int) -> bool:
    """The unrolled min-sweep selection is economical only for small k.
    (The bucketed kernels select outside the kernel and tolerate larger k,
    but 32 keeps every variant's epilogue cheap.)"""
    return 1 <= k <= 32


# ---------------------------------------------------------------------------
# bucketed-selection variant: the k sequential min-sweeps above cost ~4x the
# MXU time on the VPU (measured ~25% MFU). MFU bound (round-4 probes,
# scripts/_probe_r4e.py mfu + _probe_r4f.py): a matmul-ONLY pallas kernel on
# identical (bt=1024, nt=1024, d=768) tiles runs within ~4.5% of this full
# kernel, so the selection epilogue is NOT the limiter; a PLAIN XLA bf16
# GEMM of the whole [1024,768]x[768,31232] shape is ~20% SLOWER than the
# pallas matmul kernel (it spills the score matrix to HBM), K-major [D, N]
# corpus blocks ("NN" gemm, no per-tile RHS transpose) buy only ~2%, and
# bt/nt in {512,1024,2048} move <±5% (bf16 nt=2048 DOES fit VMEM at
# bt<=512 and was re-swept across two windows — all within noise) — the
# ~34-37% MFU headline is the bf16 matmul pipeline bound at these tile
# shapes on the (pool-shared) v5e. The way
# PAST the bf16 bound is the int8 twin below (394 TOPS = 2x the MXU rate):
# coarse-only int8 measured 1.62M QPS @ 0.9906 recall vs bf16's 1.41M @
# 0.9974 in one window (_probe_r4g.py).
# This kernel instead keeps, per
# query, the best TWO rows of each of KPAD strided buckets (bucket = row id
# mod KPAD) — a one-pass tree reduction — and extracts the exact top-k from
# the [B, 2*KPAD] bucket banks outside the kernel with one small top_k.
# A true top-k row is lost only when >= 3 of the top-k collide in one bucket
# (P ~ C(k,3)/KPAD^2 ~ 1e-3 per query at k=10), the same guarantee family as
# lax.approx_min_k's PartialReduce. Scoring uses a per-query MONOTONE key
# (cosine: -dots/|v|; l2: |v|^2-2*dots) so the in-loop epilogue is one
# multiply instead of mul+max+sqrt+div; exact distances are reconstructed
# from the key outside.
# ---------------------------------------------------------------------------

def _bucket_min2(key, rows, g: int, c: int):
    """Per-bucket (best, second-best) of key [BT, g*c] with payload rows.
    Bucket b holds lanes {b, c+b, 2c+b, ...}. Returns d1,r1,d2,r2 [BT, c]."""
    bt = key.shape[0]
    k3 = key.reshape(bt, g, c)
    r3 = rows.reshape(bt, g, c)
    d1 = jnp.min(k3, axis=1)                                   # [BT, c]
    is1 = k3 == d1[:, None, :]
    r1 = jnp.min(jnp.where(is1, r3, INT_BIG), axis=1)
    killed = r3 == r1[:, None, :]          # row ids unique within a tile
    k3b = jnp.where(killed, BIG, k3)
    d2 = jnp.min(k3b, axis=1)
    is2 = k3b == d2[:, None, :]
    r2 = jnp.min(jnp.where(is2, r3, INT_BIG), axis=1)
    r1 = jnp.where(r1 == INT_BIG, -1, r1)
    r2 = jnp.where(r2 == INT_BIG, -1, r2)
    return d1, r1, d2, r2


def _merge_pair2(a1, ai1, a2, ai2, b1, bi1, b2, bi2):
    """Merge two per-bucket sorted pairs: smallest two of {a1,a2,b1,b2}
    (a1<=a2, b1<=b2), elementwise. ~8 VPU ops on [BT, c]."""
    a_first = a1 <= b1
    n1 = jnp.where(a_first, a1, b1)
    ni1 = jnp.where(a_first, ai1, bi1)
    mid = jnp.where(a_first, b1, a1)       # loser of the first comparison
    mi = jnp.where(a_first, bi1, ai1)
    o2 = jnp.minimum(a2, b2)
    oi2 = jnp.where(a2 <= b2, ai2, bi2)
    n2 = jnp.where(mid <= o2, mid, o2)
    ni2 = jnp.where(mid <= o2, mi, oi2)
    return n1, ni1, n2, ni2


def _make_kernel_bucketed(nt: int, metric: Metric):
    c = KPAD
    g = nt // c

    def kernel(n_ref, q_ref, v_ref, vkey_ref, outd_ref, outi_ref):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _():
            outd_ref[:] = jnp.full(outd_ref.shape, BIG, jnp.float32)
            outi_ref[:] = jnp.full(outi_ref.shape, -1, jnp.int32)

        dots = jnp.dot(q_ref[:], v_ref[:].T,
                       preferred_element_type=jnp.float32)     # [BT, NT]
        vkey = vkey_ref[:].reshape(1, nt)
        if metric == Metric.COSINE:
            # vkey = 1/max(|v|, eps): order of 1 - dots/(|q||v|) per query
            # == order of -dots/|v| (|q| constant along the row)
            key = -dots * vkey
        elif metric == Metric.EUCLIDEAN:
            # vkey = |v|^2: order of |q|^2+|v|^2-2 dots == order of this
            key = vkey - 2.0 * dots
        else:                                # DOT: maximize dots
            key = -dots
        base = ti * nt
        rows = base + jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
        key = jnp.where(rows < n_ref[0], key, BIG)

        t1, tr1, t2, tr2 = _bucket_min2(key, rows, g, c)
        n1, ni1, n2, ni2 = _merge_pair2(
            outd_ref[:, :c], outi_ref[:, :c],
            outd_ref[:, c:], outi_ref[:, c:],
            t1, tr1, t2, tr2)
        outd_ref[:, :c] = n1
        outd_ref[:, c:] = n2
        outi_ref[:, :c] = ni1
        outi_ref[:, c:] = ni2

    return kernel


@partial(jax.jit, static_argnames=("k", "metric", "bt", "nt", "interpret"))
def pallas_bucket_topk(
    vectors: jnp.ndarray,   # [N_pad, D] (bf16; N_pad % nt == 0)
    v_sq: jnp.ndarray,      # [N_pad] f32 squared norms
    queries: jnp.ndarray,   # [B, D] (bf16; B % bt == 0)
    n,                      # valid row count (traced)
    *,
    k: int,
    metric: Metric,
    bt: int = DEFAULT_BT,
    nt: int = DEFAULT_NT,
    interpret: bool = False,
):
    """Bucketed fused scan. Returns (dists f32[B, k], rows int32[B, k]);
    top-k is exact up to 3-way bucket collisions (see module comment)."""
    n_pad, d = vectors.shape
    b = queries.shape[0]
    assert n_pad % nt == 0 and b % bt == 0, (n_pad, nt, b, bt)
    n_arr = jnp.full((1,), n, jnp.int32)
    if metric == Metric.COSINE:
        vkey = 1.0 / jnp.sqrt(jnp.maximum(v_sq, 1e-12))
    elif metric == Metric.EUCLIDEAN:
        vkey = v_sq
    else:
        vkey = jnp.zeros_like(v_sq)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bt, n_pad // nt),
        in_specs=[
            pl.BlockSpec((bt, d), lambda bi, ti, n_ref: (bi, 0)),
            pl.BlockSpec((nt, d), lambda bi, ti, n_ref: (ti, 0)),
            pl.BlockSpec((nt,), lambda bi, ti, n_ref: (ti,)),
        ],
        out_specs=[
            pl.BlockSpec((bt, 2 * KPAD), lambda bi, ti, n_ref: (bi, 0)),
            pl.BlockSpec((bt, 2 * KPAD), lambda bi, ti, n_ref: (bi, 0)),
        ],
    )
    bank_d, bank_r = pl.pallas_call(
        _make_kernel_bucketed(nt, metric),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 2 * KPAD), jnp.float32),
            jax.ShapeDtypeStruct((b, 2 * KPAD), jnp.int32),
        ],
        interpret=interpret,
    )(n_arr, queries, vectors, v_sq if metric != Metric.COSINE else vkey)

    # exact top-k over the 2*KPAD bucket banks (tiny), then reconstruct true
    # distances from the monotone key
    from hnsw_tpu.ops.topk import top_k_ascending
    dk, sel = top_k_ascending(bank_d, min(k, bank_d.shape[-1]))
    rk = jnp.take_along_axis(bank_r, sel, axis=-1)
    q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    if metric == Metric.COSINE:
        dist = 1.0 + dk / jnp.sqrt(jnp.maximum(q_sq, 1e-12))
    elif metric == Metric.EUCLIDEAN:
        dist = jnp.sqrt(jnp.maximum(dk + q_sq, 0.0))
    else:
        dist = dk
    ok = (dk < BIG) & (rk >= 0)
    dist = jnp.where(ok, dist, BIG)
    rk = jnp.where(ok, rk, -1)
    if dist.shape[-1] < k:
        pad = k - dist.shape[-1]
        dist = jnp.pad(dist, ((0, 0), (0, pad)), constant_values=BIG)
        rk = jnp.pad(rk, ((0, 0), (0, pad)), constant_values=-1)
    return dist, rk


def _make_kernel_int8_bucketed(nt: int, metric: Metric):
    """int8 twin of the bucketed kernel. Per-query monotone key folds the
    (positive) per-query dequant scale out entirely: cosine ranks by
    -dots_i32 * (vscale/|v|), l2 by |v|^2 - 2*qscale*vscale*dots — the
    qscale multiply only matters for l2, where it rides the [NT] vector."""
    c = KPAD
    g = nt // c

    def kernel(n_ref, q_ref, qmeta_ref, v_ref, vkey_ref, vscale_ref,
               outd_ref, outi_ref):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _():
            outd_ref[:] = jnp.full(outd_ref.shape, BIG, jnp.float32)
            outi_ref[:] = jnp.full(outi_ref.shape, -1, jnp.int32)

        dots = jnp.dot(q_ref[:], v_ref[:].T,
                       preferred_element_type=jnp.int32).astype(jnp.float32)
        vkey = vkey_ref[:].reshape(1, nt)
        if metric == Metric.COSINE:
            key = -dots * vkey                  # vkey = vscale / max(|v|,eps)
        elif metric == Metric.EUCLIDEAN:
            qscale = qmeta_ref[:, 0:1]          # [BT, 1]
            vs = vscale_ref[:].reshape(1, nt)
            key = vkey - 2.0 * qscale * vs * dots       # vkey = |v|^2
        else:
            key = -dots * vkey                  # vkey = vscale
        base = ti * nt
        rows = base + jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
        key = jnp.where(rows < n_ref[0], key, BIG)

        t1, tr1, t2, tr2 = _bucket_min2(key, rows, g, c)
        n1, ni1, n2, ni2 = _merge_pair2(
            outd_ref[:, :c], outi_ref[:, :c],
            outd_ref[:, c:], outi_ref[:, c:],
            t1, tr1, t2, tr2)
        outd_ref[:, :c] = n1
        outd_ref[:, c:] = n2
        outi_ref[:, :c] = ni1
        outi_ref[:, c:] = ni2

    return kernel


@partial(jax.jit, static_argnames=("k", "metric", "bt", "nt", "interpret"))
def pallas_int8_bucket_topk(
    v8: jnp.ndarray,        # int8 [N_pad, D]
    vscale: jnp.ndarray,    # f32 [N_pad] per-row dequant scale
    v_sq: jnp.ndarray,      # f32 [N_pad] exact squared norms
    q8: jnp.ndarray,        # int8 [B, D]
    qmeta: jnp.ndarray,     # f32 [B, 2]: (dequant scale, exact |q|^2)
    n,
    *,
    k: int,
    metric: Metric,
    bt: int = DEFAULT_BT,
    nt: int = DEFAULT_NT,
    interpret: bool = False,
):
    """Bucketed quantized coarse scan: returns approximate CANDIDATE rows
    [B, k] (distances are coarse keys; callers re-rank exactly)."""
    n_pad, d = v8.shape
    b = q8.shape[0]
    assert n_pad % nt == 0 and b % bt == 0, (n_pad, nt, b, bt)
    n_arr = jnp.full((1,), n, jnp.int32)
    if metric == Metric.COSINE:
        vkey = vscale / jnp.sqrt(jnp.maximum(v_sq, 1e-12))
    elif metric == Metric.EUCLIDEAN:
        vkey = v_sq
    else:
        vkey = vscale

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bt, n_pad // nt),
        in_specs=[
            pl.BlockSpec((bt, d), lambda bi, ti, n_ref: (bi, 0)),
            pl.BlockSpec((bt, 2), lambda bi, ti, n_ref: (bi, 0)),
            pl.BlockSpec((nt, d), lambda bi, ti, n_ref: (ti, 0)),
            pl.BlockSpec((nt,), lambda bi, ti, n_ref: (ti,)),
            pl.BlockSpec((nt,), lambda bi, ti, n_ref: (ti,)),
        ],
        out_specs=[
            pl.BlockSpec((bt, 2 * KPAD), lambda bi, ti, n_ref: (bi, 0)),
            pl.BlockSpec((bt, 2 * KPAD), lambda bi, ti, n_ref: (bi, 0)),
        ],
    )
    bank_d, bank_r = pl.pallas_call(
        _make_kernel_int8_bucketed(nt, metric),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 2 * KPAD), jnp.float32),
            jax.ShapeDtypeStruct((b, 2 * KPAD), jnp.int32),
        ],
        interpret=interpret,
    )(n_arr, q8, qmeta, v8, vkey, vscale)

    from hnsw_tpu.ops.topk import top_k_ascending
    dk, sel = top_k_ascending(bank_d, min(k, bank_d.shape[-1]))
    rk = jnp.take_along_axis(bank_r, sel, axis=-1)
    rk = jnp.where((dk < BIG) & (rk >= 0), rk, -1)
    if rk.shape[-1] < k:
        rk = jnp.pad(rk, ((0, 0), (0, k - rk.shape[-1])), constant_values=-1)
        dk = jnp.pad(dk, ((0, 0), (0, k - dk.shape[-1])), constant_values=BIG)
    return dk, rk


# ---------------------------------------------------------------------------
# packed-key int8 bucket variant (cosine/dot) — a MEASURED NULL RESULT,
# kept as the recorded bound analysis of the int8 kernel (round-5 probe,
# scripts/_probe_r5a.py, real v5e, 31,173 x 768, b=4096, one window):
#
#   full bucket kernel  bt=256 nt=2048   1.66 ms/call   2.46M QPS (30% peak)
#   matmul-ONLY kernel  same tiles       0.53 ms/call   (the MXU floor)
#   this packed kernel  bt=256 nt=2048   2.00 ms/call   2.05M QPS
#   this packed kernel  bt=256 nt=4096   1.80 ms/call   2.28M QPS
#
# i.e. the int8 kernel is VPU-EPILOGUE bound (the selection epilogue is
# ~68% of kernel time; the int8 MXU work is ~1/3), and this variant's
# attempt to cut epilogue passes did NOT pay: it biases the f32 key
# POSITIVE (positive floats compare like their int32 bit patterns),
# overwrites the low mantissa bits with the in-bucket group index, and
# runs min2 as two payload-free int32 min-reductions (~11 passes vs ~14)
# — but int32 mins + the bitcast/mask passes measure ~17% slower than the
# payload-carrying f32 kernel end to end. The production default stays
# "bucket"; this kernel remains selectable (scan_kernel="packed"),
# correctness-tested, and is the evidence that the remaining headroom to
# the 394-TOPS peak sits in the per-element selection epilogue, not the
# matmul or the tile geometry.
# (Masked-mantissa key precision: ~BIAS * 2^-23 * 2^bits ~ 0.03 absolute
# at BIAS=16384, bits=4 — far below int8 quantization noise. Cosine/dot
# only: their keys have a static magnitude bound |key| <= 127*sqrt(d) <
# BIAS; the euclidean key does not.)
# ---------------------------------------------------------------------------

PACK_BIAS = 16384.0       # > 127*sqrt(d) for d <= 8192: biased key stays
                          # positive, in binade [2^14, 2^15)
# 1.7e38 as f32 bits — finite (NOT NaN: NaN breaks min), sorts after any
# biased key. Plain python int: a jnp scalar would be captured as a traced
# constant inside the pallas kernel.
_INVALID_PACKED = 0x7F000000


def _make_kernel_int8_packed(nt: int, metric: Metric):
    c = KPAD
    g = nt // c
    gbits = max((g - 1).bit_length(), 1)
    gmask = (1 << gbits) - 1

    def kernel(n_ref, q_ref, v_ref, vkey_ref, outd_ref, outi_ref):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _():
            outd_ref[:] = jnp.full(outd_ref.shape, BIG, jnp.float32)
            outi_ref[:] = jnp.full(outi_ref.shape, -1, jnp.int32)

        dots = jnp.dot(q_ref[:], v_ref[:].T,
                       preferred_element_type=jnp.int32).astype(jnp.float32)
        nvkey = vkey_ref[:].reshape(1, nt)    # pre-negated: key = dots*nvkey
        key = dots * nvkey + PACK_BIAS        # one FMA pass, all positive
        si = jax.lax.bitcast_convert_type(key, jnp.int32)
        bt = si.shape[0]
        si3 = si.reshape(bt, g, c)
        gi = jax.lax.broadcasted_iota(jnp.int32, (1, g, c), 1)
        si3 = (si3 & ~gmask) | gi             # group id rides the low bits
        # n-mask: corpus row of element (g_idx, lane) is ti*nt + g_idx*c+lane
        j = jax.lax.broadcasted_iota(jnp.int32, (1, g, c), 1) * c + \
            jax.lax.broadcasted_iota(jnp.int32, (1, g, c), 2)
        si3 = jnp.where(ti * nt + j < n_ref[0], si3, _INVALID_PACKED)
        b1 = jnp.min(si3, axis=1)             # [BT, c] packed best
        b2 = jnp.min(jnp.where(si3 == b1[:, None, :], _INVALID_PACKED, si3),
                     axis=1)
        # decode on [BT, c]: key bits (id bits zeroed) + reconstructed row
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, c), 1)

        def decode(b):
            kf = jax.lax.bitcast_convert_type(b & ~gmask, jnp.float32)
            row = ti * nt + (b & gmask) * c + lane
            ok = b < _INVALID_PACKED
            return jnp.where(ok, kf, BIG), jnp.where(ok, row, -1)

        t1, tr1 = decode(b1)
        t2, tr2 = decode(b2)
        n1, ni1, n2, ni2 = _merge_pair2(
            outd_ref[:, :c], outi_ref[:, :c],
            outd_ref[:, c:], outi_ref[:, c:],
            t1, tr1, t2, tr2)
        outd_ref[:, :c] = n1
        outd_ref[:, c:] = n2
        outi_ref[:, :c] = ni1
        outi_ref[:, c:] = ni2

    return kernel


@partial(jax.jit, static_argnames=("k", "metric", "bt", "nt", "interpret"))
def pallas_int8_packed_topk(
    v8: jnp.ndarray,        # int8 [N_pad, D]
    vscale: jnp.ndarray,    # f32 [N_pad] per-row dequant scale
    v_sq: jnp.ndarray,      # f32 [N_pad] exact squared norms
    q8: jnp.ndarray,        # int8 [B, D]
    qmeta: jnp.ndarray,     # f32 [B, 2]: (dequant scale, exact |q|^2)
    n,
    *,
    k: int,
    metric: Metric,
    bt: int = INT8_BT,
    nt: int = INT8_NT,
    interpret: bool = False,
):
    """Packed-key bucketed int8 coarse scan (cosine/dot). Returns
    (biased keys [B, k] — still carrying PACK_BIAS, for the caller's
    distance reconstruction — and candidate rows [B, k])."""
    assert metric in (Metric.COSINE, Metric.DOT), metric
    n_pad, d = v8.shape
    b = q8.shape[0]
    assert n_pad % nt == 0 and b % bt == 0, (n_pad, nt, b, bt)
    n_arr = jnp.full((1,), n, jnp.int32)
    if metric == Metric.COSINE:
        nvkey = -vscale / jnp.sqrt(jnp.maximum(v_sq, 1e-12))
    else:
        nvkey = -vscale

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bt, n_pad // nt),
        in_specs=[
            pl.BlockSpec((bt, d), lambda bi, ti, n_ref: (bi, 0)),
            pl.BlockSpec((nt, d), lambda bi, ti, n_ref: (ti, 0)),
            pl.BlockSpec((nt,), lambda bi, ti, n_ref: (ti,)),
        ],
        out_specs=[
            pl.BlockSpec((bt, 2 * KPAD), lambda bi, ti, n_ref: (bi, 0)),
            pl.BlockSpec((bt, 2 * KPAD), lambda bi, ti, n_ref: (bi, 0)),
        ],
    )
    bank_d, bank_r = pl.pallas_call(
        _make_kernel_int8_packed(nt, metric),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 2 * KPAD), jnp.float32),
            jax.ShapeDtypeStruct((b, 2 * KPAD), jnp.int32),
        ],
        interpret=interpret,
    )(n_arr, q8, v8, nvkey)

    from hnsw_tpu.ops.topk import top_k_ascending
    dk, sel = top_k_ascending(bank_d, min(k, bank_d.shape[-1]))
    rk = jnp.take_along_axis(bank_r, sel, axis=-1)
    ok = (dk < BIG) & (rk >= 0)
    dk = jnp.where(ok, dk - PACK_BIAS, BIG)   # un-bias: raw monotone key
    rk = jnp.where(ok, rk, -1)
    if rk.shape[-1] < k:
        rk = jnp.pad(rk, ((0, 0), (0, k - rk.shape[-1])), constant_values=-1)
        dk = jnp.pad(dk, ((0, 0), (0, k - dk.shape[-1])), constant_values=BIG)
    return dk, rk


# ---------------------------------------------------------------------------
# int8 variant: quantized coarse scan (scores = int8 MXU dots dequantized
# with per-row scales; exact norms supplied separately)
# ---------------------------------------------------------------------------

def _make_kernel_int8(k: int, nt: int, metric: Metric):
    def kernel(n_ref, q_ref, qmeta_ref, v_ref, vsq_ref, vscale_ref,
               outd_ref, outi_ref):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _():
            outd_ref[:] = jnp.full(outd_ref.shape, BIG, jnp.float32)
            outi_ref[:] = jnp.full(outi_ref.shape, -1, jnp.int32)

        q8 = q_ref[:]                                     # int8 [BT, D]
        v8 = v_ref[:]                                     # int8 [NT, D]
        dots = jnp.dot(q8, v8.T, preferred_element_type=jnp.int32)
        qscale = qmeta_ref[:, 0:1]                        # [BT, 1]
        q_sq = qmeta_ref[:, 1:2]                          # [BT, 1]
        vscale = vscale_ref[:].reshape(1, nt)
        dotsf = dots.astype(jnp.float32) * qscale * vscale
        v_sq = vsq_ref[:].reshape(1, nt)
        if metric == Metric.COSINE:
            denom = jnp.sqrt(jnp.maximum(q_sq * v_sq, 1e-12))
            dist = 1.0 - dotsf / denom
        elif metric == Metric.EUCLIDEAN:
            dist = jnp.sqrt(jnp.maximum(q_sq + v_sq - 2.0 * dotsf, 0.0))
        else:
            dist = -dotsf
        base = ti * nt
        rows = base + jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        dist = jnp.where(rows < n_ref[0], dist, BIG)

        tile_d, tile_r = _tile_topk(dist, rows, k)
        cand_d = jnp.concatenate([outd_ref[:, :k], tile_d], axis=1)
        cand_r = jnp.concatenate([outi_ref[:, :k], tile_r], axis=1)
        mer_d, mer_r = _merge_sorted(cand_d, cand_r, k)
        outd_ref[:, :k] = mer_d
        outi_ref[:, :k] = jnp.where(mer_d < BIG, mer_r, -1)

    return kernel


@partial(jax.jit, static_argnames=("k", "metric", "bt", "nt", "interpret"))
def pallas_int8_topk(
    v8: jnp.ndarray,        # int8 [N_pad, D]
    vscale: jnp.ndarray,    # f32 [N_pad]
    v_sq: jnp.ndarray,      # f32 [N_pad] exact squared norms
    q8: jnp.ndarray,        # int8 [B, D]
    qmeta: jnp.ndarray,     # f32 [B, 2]: (dequant scale, exact |q|^2)
    n,
    *,
    k: int,
    metric: Metric,
    bt: int = DEFAULT_BT,
    nt: int = DEFAULT_NT,
    interpret: bool = False,
):
    """Quantized fused scan (coarse): returns approx (dists [B,k], rows);
    callers re-rank with exact f32 scores."""
    n_pad, d = v8.shape
    b = q8.shape[0]
    assert n_pad % nt == 0 and b % bt == 0, (n_pad, nt, b, bt)
    n_arr = jnp.full((1,), n, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bt, n_pad // nt),
        in_specs=[
            pl.BlockSpec((bt, d), lambda bi, ti, n_ref: (bi, 0)),
            pl.BlockSpec((bt, 2), lambda bi, ti, n_ref: (bi, 0)),
            pl.BlockSpec((nt, d), lambda bi, ti, n_ref: (ti, 0)),
            pl.BlockSpec((nt,), lambda bi, ti, n_ref: (ti,)),
            pl.BlockSpec((nt,), lambda bi, ti, n_ref: (ti,)),
        ],
        out_specs=[
            pl.BlockSpec((bt, KPAD), lambda bi, ti, n_ref: (bi, 0)),
            pl.BlockSpec((bt, KPAD), lambda bi, ti, n_ref: (bi, 0)),
        ],
    )
    outd, outi = pl.pallas_call(
        _make_kernel_int8(k, nt, metric),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, KPAD), jnp.float32),
            jax.ShapeDtypeStruct((b, KPAD), jnp.int32),
        ],
        interpret=interpret,
    )(n_arr, q8, qmeta, v8, v_sq, vscale)
    return outd[:, :k], outi[:, :k]
