"""Flat / exact brute-force index.

The TPU-native form of the reference's exact-kNN ground-truth engine
(bench.clj:72-84 compute-exact-knn: brute-force cosine over the corpus) and
its brute-force `top-k-distances` helper (simd_optimized.clj:200-216). One
fused MXU GEMM + masked top-k per corpus tile, streamed with a running merge
so arbitrarily large corpora fit in fixed device memory.

On TPU this is simultaneously (a) a production index family in its own right
— at 31k x 768 the full scan beats the reference's 20-thread HNSW QPS — and
(b) the recall ground truth every approximate family is measured against.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from hnsw_tpu.config import Mode
from hnsw_tpu.models.base import ANNIndex
from hnsw_tpu.ops.distance import BIG, distances_from_dots
from hnsw_tpu.ops.topk import top_k_ascending
from hnsw_tpu.types import Corpus, Metric

# Corpus-tile row count for the streaming scan. 32k rows x 768 f32 = ~96 MB
# HBM reads per tile; the [B, TILE] score block stays small.
DEFAULT_TILE = 32768


@partial(jax.jit, static_argnames=("k", "metric", "tile", "precision"))
def exact_topk(
    vectors: jnp.ndarray,   # [N_pad, D]
    v_sq: jnp.ndarray,      # [N_pad]
    queries: jnp.ndarray,   # [B, D]
    *,
    k: int,
    n,                      # valid row count (traced: no recompile per size)
    metric: Metric,
    tile: int = DEFAULT_TILE,
    precision: str = "f32",
    row_mask: jnp.ndarray | None = None,   # bool [N_pad]: exact filtering
):
    """Exact top-k over the packed corpus. Returns (dists [B,k], rows [B,k]);
    rows >= n never appear (masked to BIG); if k > n the tail has row -1.
    row_mask (optional) excludes rows exactly — native filtered search,
    stronger than the reference's over-fetch-and-post-filter default."""
    n = jnp.asarray(n, jnp.int32)
    n_pad, d = vectors.shape
    b = queries.shape[0]
    kk = min(k, n_pad)

    q = queries.astype(jnp.bfloat16) if precision == "bf16" else queries
    q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1, keepdims=True)

    def score_tile(vt, vt_sq, base, mask_t=None):
        vv = vt.astype(jnp.bfloat16) if precision == "bf16" else vt
        prec = None if precision == "bf16" else jax.lax.Precision.HIGHEST
        dots = jnp.dot(q, vv.T, preferred_element_type=jnp.float32,
                       precision=prec)
        dist = distances_from_dots(dots, q_sq, vt_sq, metric)
        rows = base + jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        dist = jnp.where(rows < n, dist, BIG)
        if mask_t is not None:
            dist = jnp.where(mask_t[None, :], dist, BIG)
        return dist, rows

    if n_pad <= tile:
        dist, rows = score_tile(vectors, v_sq, jnp.int32(0), row_mask)
        dk, sel = top_k_ascending(dist, kk)
        rk = jnp.take_along_axis(rows, sel, axis=-1)
    else:
        num_tiles = n_pad // tile if n_pad % tile == 0 else n_pad // tile + 1
        pad_to = num_tiles * tile
        if pad_to != n_pad:
            vectors = jnp.pad(vectors, ((0, pad_to - n_pad), (0, 0)))
            v_sq = jnp.pad(v_sq, (0, pad_to - n_pad))
            if row_mask is not None:
                row_mask = jnp.pad(row_mask, (0, pad_to - n_pad))
        vt = vectors.reshape(num_tiles, tile, d)
        vt_sq = v_sq.reshape(num_tiles, tile)
        mask_t = row_mask.reshape(num_tiles, tile) if row_mask is not None \
            else jnp.ones((num_tiles, tile), bool)

        def body(carry, xs):
            best_d, best_r = carry
            vblk, vblk_sq, base, mblk = xs
            dist, rows = score_tile(vblk, vblk_sq, base,
                                    mblk if row_mask is not None else None)
            d_all = jnp.concatenate([best_d, dist], axis=-1)
            r_all = jnp.concatenate([best_r, rows], axis=-1)
            dk, sel = top_k_ascending(d_all, kk)
            return (dk, jnp.take_along_axis(r_all, sel, axis=-1)), None

        init = (jnp.full((b, kk), BIG), jnp.full((b, kk), -1, jnp.int32))
        bases = jnp.arange(num_tiles, dtype=jnp.int32) * tile
        (dk, rk), _ = jax.lax.scan(body, init, (vt, vt_sq, bases, mask_t))

    # normalize missing results (k > n) to row -1
    rk = jnp.where(dk >= BIG, -1, rk)
    if kk < k:
        dk = jnp.pad(dk, ((0, 0), (0, k - kk)), constant_values=BIG)
        rk = jnp.pad(rk, ((0, 0), (0, k - kk)), constant_values=-1)
    return dk, rk


@partial(jax.jit, static_argnames=("k", "fetch", "metric"))
def int8_topk(
    v8: jnp.ndarray,        # int8 [N_pad, D]
    vscale: jnp.ndarray,    # f32 [N_pad] per-row dequant scale
    vectors: jnp.ndarray,   # f32 [N_pad, D] (for the exact re-rank)
    v_sq: jnp.ndarray,      # f32 [N_pad]
    queries: jnp.ndarray,   # f32 [B, D]
    n,
    *,
    k: int,
    fetch: int,
    metric: Metric,
):
    """Two-phase quantized scan: int8 MXU coarse pass (per-row symmetric
    quantization) -> exact f32 re-rank of the top `fetch` candidates. The
    int8 matmul runs at ~2x bf16 MXU throughput and quarters the corpus
    bytes; the re-rank restores exact distances (AQR-style pipeline).

    fetch <= 0 selects COARSE-ONLY mode (the XLA twin of
    FlatIndex._int8_pallas's int8_fetch=0): the dequantized coarse ordering
    and distances are returned directly, skipping the re-rank's
    scattered-row gather — so the coarse-only intent is honored on every
    backend, not just the Pallas path."""
    from hnsw_tpu.ops.distance import gather_score

    n = jnp.asarray(n, jnp.int32)
    qmax = jnp.max(jnp.abs(queries), axis=1, keepdims=True)
    qscale = jnp.maximum(qmax / 127.0, 1e-12)
    q8 = jnp.clip(jnp.round(queries / qscale), -127, 127).astype(jnp.int8)
    dots = jnp.dot(q8, v8.T, preferred_element_type=jnp.int32)
    dots = dots.astype(jnp.float32) * qscale * vscale[None, :]
    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    dist = distances_from_dots(dots, q_sq, v_sq, metric)
    rows = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    dist = jnp.where(rows < n, dist, BIG)
    if fetch <= 0:          # coarse-only: no exact re-rank
        dk, cand = top_k_ascending(dist, min(k, dist.shape[-1]))
        return dk, jnp.where(dk < BIG, cand, -1)
    _, cand = top_k_ascending(dist, min(fetch, dist.shape[-1]))

    d = gather_score(queries, jnp.maximum(cand, 0), vectors, v_sq,
                     metric=metric, valid=cand < n)
    dk, sel = top_k_ascending(d, k)
    rk = jnp.where(dk < BIG, jnp.take_along_axis(cand, sel, axis=-1), -1)
    return dk, rk


class FlatIndex(ANNIndex):
    """Exact brute-force index (recall = 1.0 by construction with the
    default f32 precision). precision="bf16" takes the fused Pallas scan on
    TPU (~1e-3 distance error); precision="int8" takes a quantized coarse
    pass with exact re-rank."""

    family = "flat"

    def __init__(self, corpus: Corpus, *, precision: str = "f32",
                 tile: int = DEFAULT_TILE, scan_kernel: str = "auto",
                 int8_fetch: int | None = None):
        super().__init__(corpus)
        self.precision = precision
        self.tile = tile
        # int8 path: how many coarse candidates the exact f32 re-rank
        # considers (None = auto, k+6). The re-rank's scattered-row
        # gather is the int8 path's overhead (round-3: 701k QPS measured vs
        # the kernel's 1.98M coarse rate); a tighter fetch trades a little
        # tail recall for throughput. fetch <= k still re-scores the k
        # returned rows so reported distances stay exact. int8_fetch=0
        # selects COARSE-ONLY mode (no re-rank; ~0.99 recall at 31k from
        # the per-row-scale ordering alone) on BOTH the Pallas and the XLA
        # fallback path — see _int8_pallas / int8_topk.
        self.int8_fetch = int8_fetch
        # "auto" | "bucket" | "sweep" | "packed": which fused Pallas
        # selection kernel the bf16/int8 paths use. The bucketed kernel
        # (one tree-reduction per tile, exact up to 3-way bucket collisions
        # ~1e-3/query at k=10) replaces the k sequential min-sweeps that
        # kept the sweep kernel at ~25% MFU; "packed" (int8 cosine/dot
        # only) additionally packs the group id into the key's mantissa so
        # the selection runs payload-free (see pallas_scan.py); "auto"
        # resolves to "bucket".
        self.scan_kernel = scan_kernel
        self._pallas_arrays = None
        self._int8_arrays = None

    def _use_bucket(self) -> bool:
        # "packed" is int8-specific; the bf16 path treats it as bucket
        return self.scan_kernel in ("auto", "bucket", "packed")

    def _get_int8_arrays(self):
        if self._int8_arrays is None or len(self._int8_arrays) != 2:
            v = self.corpus.vectors
            vmax = jnp.max(jnp.abs(v), axis=1, keepdims=True)
            vscale = jnp.maximum(vmax / 127.0, 1e-12)
            v8 = jnp.clip(jnp.round(v / vscale), -127, 127).astype(jnp.int8)
            self._int8_arrays = (v8, vscale[:, 0])
        return self._int8_arrays

    def _int8_pallas(self, q, k: int, fetch: int):
        """Pallas quantized coarse scan + exact f32 re-rank.

        fetch <= 0 selects COARSE-ONLY mode: the int8 MXU ordering is
        returned directly (distances reconstructed from the kernel's
        per-query monotone key), skipping the re-rank's scattered-row
        gather entirely. Per-row-scale int8 dots carry ~0.3% relative
        error — the same band as bf16 rounding — so coarse-only recall
        sits near the bf16 kernel's, at the int8 MXU's 2x rate (394 TOPS
        v5e). The default (fetch=k+6) re-ranks for ~0.999 recall."""
        from hnsw_tpu.ops.distance import gather_score
        from hnsw_tpu.ops.pallas_scan import (
            INT8_BT, INT8_NT, pallas_int8_bucket_topk, pallas_int8_topk,
        )

        if self._int8_arrays is None or len(self._int8_arrays) != 4:
            v = self.corpus.vectors
            vmax = jnp.max(jnp.abs(v), axis=1, keepdims=True)
            vscale = jnp.maximum(vmax / 127.0, 1e-12)
            v8 = jnp.clip(jnp.round(v / vscale), -127, 127).astype(jnp.int8)
            # INT8_NT-aligned pack serves both kernels (2048 is a multiple
            # of the sweep kernel's nt=1024)
            n_pad = ((self.corpus.n_pad + INT8_NT - 1)
                     // INT8_NT) * INT8_NT
            extra = n_pad - self.corpus.n_pad
            v8 = jnp.pad(v8, ((0, extra), (0, 0)))
            vs = jnp.pad(vscale[:, 0], (0, extra))
            vsq = jnp.pad(self.corpus.sq_norms, (0, extra))
            self._int8_arrays = (v8, vs, vsq, n_pad)
        v8, vs, vsq, _ = self._int8_arrays

        b = q.shape[0]
        kname = "bucket" if self.scan_kernel == "auto" else self.scan_kernel
        if kname == "packed" and self.corpus.metric not in (Metric.COSINE,
                                                            Metric.DOT):
            kname = "bucket"   # euclidean key has no static bias bound
        if kname in ("bucket", "packed"):
            # small query tiles over deep int8 corpus tiles: bt=256/nt=2048
            # measured ~6-7% over 1024/1024 across three pool windows
            # (scripts/_probe_r4h.py)
            bt, nt = INT8_BT, INT8_NT
            bt = min(bt, max(((b + 7) // 8) * 8, 8))
        else:
            # the sweep kernel holds more live tiles (int32 dots + f32 dist
            # + sweep temporaries); bt=512 exceeds the 16MB VMEM scoped limit
            bt, nt = min(256, max(((b + 7) // 8) * 8, 8)), 1024
        b_pad = ((b + bt - 1) // bt) * bt
        qf = jnp.zeros((b_pad, q.shape[1]), jnp.float32).at[:b].set(q)
        qmax = jnp.max(jnp.abs(qf), axis=1, keepdims=True)
        qscale = jnp.maximum(qmax / 127.0, 1e-12)
        q8 = jnp.clip(jnp.round(qf / qscale), -127, 127).astype(jnp.int8)
        qmeta = jnp.concatenate(
            [qscale, jnp.sum(qf * qf, axis=1, keepdims=True)], axis=1)
        if kname == "packed":
            from hnsw_tpu.ops.pallas_scan import pallas_int8_packed_topk
            kern = pallas_int8_packed_topk
        else:
            kern = pallas_int8_bucket_topk if kname == "bucket" \
                else pallas_int8_topk
        dk, cand = kern(v8, vs, vsq, q8, qmeta, self.corpus.n,
                        k=(fetch if fetch > 0 else k),
                        metric=self.corpus.metric, bt=bt, nt=nt)
        if fetch <= 0:
            # coarse-only: reconstruct distances from the monotone key
            # (bucket/packed kernels share the same key semantics; the
            # sweep kernel already emits approx dists)
            dk, cand = dk[:b], cand[:b]
            if kname in ("bucket", "packed"):
                qscale = qmeta[:b, 0:1]
                q_sq = qmeta[:b, 1:2]
                if self.corpus.metric == Metric.COSINE:
                    # key = -dots_i32 * vscale/|v|; dots_f = dots_i32*qs*vs
                    dist = 1.0 + dk * qscale / jnp.sqrt(
                        jnp.maximum(q_sq, 1e-12))
                elif self.corpus.metric == Metric.EUCLIDEAN:
                    # key = |v|^2 - 2*qs*vs*dots; d^2 = |q|^2 + key
                    dist = jnp.sqrt(jnp.maximum(dk + q_sq, 0.0))
                else:
                    dist = dk * qscale
            else:
                dist = dk
            ok = (cand >= 0) & (dk < BIG)
            return jnp.where(ok, dist, BIG), jnp.where(ok, cand, -1)
        cand = cand[:b]
        d = gather_score(q, jnp.maximum(cand, 0), self.corpus.vectors,
                         self.corpus.sq_norms, metric=self.corpus.metric,
                         valid=cand >= 0)
        dk, sel = top_k_ascending(d, k)
        rk = jnp.where(dk < BIG, jnp.take_along_axis(cand, sel, axis=-1), -1)
        return dk, rk

    def _pallas_ready(self, k: int) -> bool:
        from hnsw_tpu.ops import pallas_scan
        return (self.precision == "bf16" and pallas_scan.supported(k)
                and jax.default_backend() == "tpu" and self.corpus.n > 0)

    def _get_pallas_arrays(self):
        from hnsw_tpu.ops.pallas_scan import DEFAULT_NT
        if self._pallas_arrays is None:
            n_pad = ((self.corpus.n_pad + DEFAULT_NT - 1)
                     // DEFAULT_NT) * DEFAULT_NT
            vec = jnp.zeros((n_pad, self.corpus.d_pad), jnp.bfloat16)
            vec = vec.at[: self.corpus.n_pad].set(
                self.corpus.vectors.astype(jnp.bfloat16))
            vsq = jnp.zeros((n_pad,), jnp.float32)
            vsq = vsq.at[: self.corpus.n_pad].set(self.corpus.sq_norms)
            self._pallas_arrays = (vec, vsq)
        return self._pallas_arrays

    def search_batch(self, queries, k: int, mode: Mode = Mode.BALANCED,
                     row_mask=None):
        q = self.corpus.pad_queries(queries)
        if row_mask is not None:
            mask = jnp.zeros((self.corpus.n_pad,), bool)
            mask = mask.at[: len(row_mask)].set(jnp.asarray(row_mask, bool))
            return exact_topk(
                self.corpus.vectors, self.corpus.sq_norms, q,
                k=k, n=self.corpus.n, metric=self.corpus.metric,
                tile=self.tile, precision="f32", row_mask=mask)
        if self.precision == "int8" and self.corpus.n > 0:
            from hnsw_tpu.ops import pallas_scan
            # auto fetch k+6: the coarse int8 ordering is already ~exact —
            # at 31k/k=10, fetch=16 re-ranks to 0.999 recall at 977k QPS vs
            # 710k for the old 3k fetch (the re-rank's scattered-row gather
            # is the path's only overhead). int8_fetch=0 skips the re-rank
            # entirely (coarse-only, see _int8_pallas).
            if self.int8_fetch is None:
                fetch = k + 6
            elif self.int8_fetch <= 0:
                fetch = 0
            else:
                fetch = max(self.int8_fetch, k)
            if jax.default_backend() == "tpu" and \
                    pallas_scan.supported(max(fetch, k)):
                return self._int8_pallas(q, k, fetch)
            # XLA fallback (CPU, or k beyond the Pallas kernels' range):
            # int8_fetch=0 keeps its coarse-only meaning here too (fetch=0
            # skips the re-rank inside int8_topk); otherwise re-rank a
            # slightly wider pool than the Pallas path — the XLA coarse
            # ordering is the same quality, the wider fetch is free next to
            # the materialized [B, N] score matrix
            return int8_topk(*self._get_int8_arrays(), self.corpus.vectors,
                             self.corpus.sq_norms, q, self.corpus.n,
                             k=k,
                             fetch=0 if fetch <= 0 else max(fetch, 4 * k,
                                                            k + 32),
                             metric=self.corpus.metric)
        if self._pallas_ready(k):
            from hnsw_tpu.ops.pallas_scan import (
                DEFAULT_BT, pallas_bucket_topk, pallas_exact_topk,
            )
            vec, vsq = self._get_pallas_arrays()
            b = q.shape[0]
            # bucket kernel: bt=1024 measured fastest (1.52M QPS, 74 TFLOP/s
            # at 31k x 768); the sweep kernel's k live tiles cap it at 512
            bt_cap = 2 * DEFAULT_BT if self._use_bucket() else DEFAULT_BT
            bt = min(bt_cap, max(((b + 7) // 8) * 8, 8))
            b_pad = ((b + bt - 1) // bt) * bt
            qp = jnp.zeros((b_pad, q.shape[1]), jnp.bfloat16)
            qp = qp.at[:b].set(q.astype(jnp.bfloat16))
            kern = pallas_bucket_topk if self._use_bucket() \
                else pallas_exact_topk
            d, r = kern(vec, vsq, qp, self.corpus.n,
                        k=k, metric=self.corpus.metric, bt=bt)
            return d[:b], r[:b]
        return exact_topk(
            self.corpus.vectors, self.corpus.sq_norms, q,
            k=k, n=self.corpus.n, metric=self.corpus.metric,
            tile=self.tile, precision=self.precision,
        )

    def index_info(self) -> Dict[str, Any]:
        return {
            "type": self.family,
            "num_vectors": self.corpus.n,
            "dimensions": self.corpus.dim,
            "metric": self.corpus.metric.value,
            "precision": self.precision,
            "memory_mb": self.corpus.vectors.size * 4 / 1e6,
        }

    def to_state(self) -> Dict[str, Any]:
        return {"params": {"precision": self.precision, "tile": self.tile,
                           "scan_kernel": self.scan_kernel,
                           "int8_fetch": self.int8_fetch},
                "arrays": {}}

    @classmethod
    def from_state(cls, corpus: Corpus, state: Dict[str, Any]) -> "FlatIndex":
        p = state.get("params", {})
        f = p.get("int8_fetch")
        return cls(corpus, precision=p.get("precision", "f32"),
                   tile=int(p.get("tile", DEFAULT_TILE)),
                   scan_kernel=str(p.get("scan_kernel", "auto")),
                   int8_fetch=int(f) if f is not None else None)

    def search_filtered(self, query, k, predicate, mode=Mode.BALANCED,
                        overfetch: int = 3):
        """Native exact filtered search: the predicate becomes a row mask
        applied before top-k (no over-fetch loss, unlike the reference's
        protocol.clj:97-102 default, which remains the base-class path for
        the other families)."""
        import numpy as np
        ids = self.corpus.ids if self.corpus.ids is not None else \
            np.arange(self.corpus.n)
        mask = np.fromiter((bool(predicate(i)) for i in ids), bool,
                           count=self.corpus.n)
        q = np.asarray(query, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        d, r = self.search_batch(q, k, mode, row_mask=mask)
        return self._to_result(np.asarray(d)[0], np.asarray(r)[0]).to_dicts()


def build_flat_index(data, *, metric="cosine", ids=None, precision="f32",
                     scan_kernel="auto", int8_fetch=None,
                     **_ignored) -> FlatIndex:
    """Build from a host array [n, dim] or reference-style [id, vec] pairs."""
    from hnsw_tpu.models.common import as_corpus
    corpus = as_corpus(data, metric=metric, ids=ids)
    return FlatIndex(corpus, precision=precision, scan_kernel=scan_kernel,
                     int8_fetch=int8_fetch)
