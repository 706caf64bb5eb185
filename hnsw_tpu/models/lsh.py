"""Hybrid multi-probe LSH.

Reference: src/hnsw/ann/hash/hybrid_lsh.clj — 8 tables x 12 bits (4096
buckets), Gaussian random projections (:12-14, seeded :80); build hashes
every vector per table (dense matvec then sign bits, :33-55) into locked
bucket lists (:113-129); search probes the main bucket per table plus
buckets reached by flipping bucket-id bits (multi-probe, radius = number of
flipped bits, :261-342), brute-force scans each bucket (:147-193), dedupes
by id and takes a global top-k (:330-342). Modes map to (probes-per-table,
radius): :turbo (2,1) ... :precise (8,4) (:357-362).

TPU design: hashing all N vectors for all tables is ONE GEMM
[N, D] x [D, T*bits] + sign bit-pack. Buckets are fixed-capacity rows of an
int32 table [T, 2^bits, cap] (overflow dropped — bounded loss, same spirit
as the reference's 45% recall operating point). Multi-probe flips are
margin-ordered: bits whose projection is closest to the hyperplane flip
first, which dominates the reference's unordered bit flips at equal probe
count. Search = gather candidate rows for all (table, probe) pairs, one
fused gather+dot score, duplicate-aware top-k.
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from hnsw_tpu.config import LSH_MODES, Mode
from hnsw_tpu.models.base import ANNIndex
from hnsw_tpu.models.common import as_corpus
from hnsw_tpu.ops.distance import BIG, gather_score
from hnsw_tpu.ops.topk import dedupe_ascending, top_k_ascending
from hnsw_tpu.types import Corpus, Metric

NUM_TABLES = 8      # hybrid_lsh.clj:12
NUM_BITS = 12       # hybrid_lsh.clj:13 (4096 buckets)


def _probe_combos(probes: int, radius: int, nbits: int) -> List[Tuple[int, ...]]:
    """Static probe schedule: which margin-rank bits to flip per probe.
    Probe 0 flips nothing; then singles in margin order, then pairs, etc.,
    bounded by radius bits flipped at once."""
    combos: List[Tuple[int, ...]] = [()]
    for r in range(1, max(radius, 1) + 1):
        combos.extend(itertools.combinations(range(min(nbits, 8)), r))
    return combos[:probes]


@partial(jax.jit, static_argnames=("probes", "radius", "flip_order"))
def _query_buckets(q: jnp.ndarray, proj: jnp.ndarray, *, probes: int,
                   radius: int, flip_order: str = "margin"):
    """Bucket ids to probe. q: [B, D]; proj: [T, D, bits].
    Returns int32 [B, T, probes]. flip_order="fixed" flips bit POSITIONS in
    index order — the reference's query-independent flip schedule
    (hybrid_lsh.clj:293-299) — kept for the measured A/B against the
    margin-ordered default (test_families.py:test_lsh_margin_flips_beat_
    fixed_flips: margin 0.635 vs fixed 0.485 recall@10 at equal probes on
    the 8k clustered corpus, :accurate mode)."""
    nbits = proj.shape[-1]
    scores = jnp.einsum("bd,tdh->bth", q, proj,
                        preferred_element_type=jnp.float32)   # [B, T, bits]
    bits = (scores > 0).astype(jnp.int32)
    weights = (1 << jnp.arange(nbits, dtype=jnp.int32))
    base = jnp.sum(bits * weights[None, None, :], axis=-1)    # [B, T]
    if flip_order == "fixed":
        margin_rank = jnp.broadcast_to(
            jnp.arange(nbits, dtype=jnp.int32)[None, None, :], scores.shape)
    else:
        # margin order: ascending |score| = least confident bit first
        margin_rank = jnp.argsort(jnp.abs(scores), axis=-1)   # [B, T, bits]
    combos = _probe_combos(probes, radius, nbits)
    out = []
    for combo in combos:
        flip = jnp.zeros_like(base)
        for rank in combo:
            bit_idx = margin_rank[:, :, rank]
            flip = flip ^ (1 << bit_idx)
        out.append(base ^ flip)
    return jnp.stack(out, axis=-1)                            # [B, T, probes]


class HybridLSHIndex(ANNIndex):
    family = "hybrid_lsh"

    def __init__(self, corpus: Corpus, *, proj, buckets, num_tables: int,
                 num_bits: int, bucket_cap: int, seed: int = 42,
                 overflow: Optional[Dict[str, int]] = None):
        super().__init__(corpus)
        self.proj = proj            # [T, D_pad, bits] float32
        self.buckets = buckets      # int32 [T, 2^bits, cap] rows, -1 pad
        self.num_tables = num_tables
        self.num_bits = num_bits
        self.bucket_cap = bucket_cap
        self.seed = seed
        # bucket_cap overflow accounting (the reference keeps every vector —
        # hybrid_lsh.clj:113-129; we bound buckets but never silently:
        # dropped_slots = (row, table) placements shed; rows_unreachable =
        # rows shed from ALL tables, i.e. actual recall loss)
        self.overflow = overflow or {"dropped_slots": 0, "rows_unreachable": 0}

    def search_batch(self, queries, k: int, mode: Mode = Mode.BALANCED,
                     num_probes: Optional[int] = None,
                     radius: Optional[int] = None,
                     flip_order: str = "margin"):
        q = self.corpus.pad_queries(queries)
        mode = Mode.coerce(mode)
        p_m, r_m = LSH_MODES[mode]
        probes = num_probes or p_m
        radius = radius or r_m
        return _lsh_search(
            self.corpus.vectors, self.corpus.sq_norms, self.proj,
            self.buckets, q, k=k, probes=probes, radius=radius,
            metric=self.corpus.metric, flip_order=flip_order)

    def index_info(self) -> Dict[str, Any]:
        occupancy = np.asarray((self.buckets >= 0).sum(axis=-1))
        return {
            "type": self.family,
            "num_vectors": self.corpus.n,
            "dimensions": self.corpus.dim,
            "metric": self.corpus.metric.value,
            "num_tables": self.num_tables,
            "num_bits": self.num_bits,
            "num_buckets": self.buckets.shape[1],
            "bucket_cap": self.bucket_cap,
            "avg_bucket_occupancy": float(occupancy.mean()),
            "max_bucket_occupancy": int(occupancy.max()),
            "overflow_dropped_slots": int(self.overflow["dropped_slots"]),
            "overflow_rows_unreachable": int(
                self.overflow["rows_unreachable"]),
        }

    def to_state(self) -> Dict[str, Any]:
        return {
            "params": {"num_tables": self.num_tables,
                       "num_bits": self.num_bits,
                       "bucket_cap": self.bucket_cap, "seed": self.seed},
            "arrays": {"proj": np.asarray(self.proj),
                       "buckets": np.asarray(self.buckets)},
        }

    @classmethod
    def from_state(cls, corpus: Corpus, state: Dict[str, Any]) -> "HybridLSHIndex":
        p, a = state["params"], state["arrays"]
        return cls(corpus, proj=jnp.asarray(a["proj"]),
                   buckets=jnp.asarray(a["buckets"]),
                   num_tables=int(p["num_tables"]),
                   num_bits=int(p["num_bits"]),
                   bucket_cap=int(p["bucket_cap"]),
                   seed=int(p.get("seed", 42)))


@partial(jax.jit, static_argnames=("k", "probes", "radius", "metric",
                                   "flip_order"))
def _lsh_search(vectors, v_sq, proj, buckets, q, *, k, probes, radius, metric,
                flip_order="margin"):
    b = q.shape[0]
    bucket_ids = _query_buckets(q, proj, probes=probes, radius=radius,
                                flip_order=flip_order)
    t, _, cap = buckets.shape
    # gather candidate rows: [B, T, probes, cap] -> [B, C]
    table_idx = jnp.arange(t, dtype=jnp.int32)[None, :, None]
    cand = buckets[table_idx, bucket_ids]                     # [B, T, P, cap]
    cand = cand.reshape(b, -1)
    valid = cand >= 0
    d = gather_score(q, jnp.maximum(cand, 0), vectors, v_sq,
                     metric=metric, valid=valid)
    # duplicate-aware top-k: over-fetch, dedupe by id, reselect
    fetch = min(max(4 * k, k + 16), d.shape[-1])
    d_f, sel = top_k_ascending(d, fetch)
    i_f = jnp.where(d_f < BIG, jnp.take_along_axis(cand, sel, axis=-1), -1)
    dk, rk = dedupe_ascending(d_f, i_f, k if k <= fetch else fetch)
    rk = jnp.where(dk < BIG, rk, -1)
    if dk.shape[-1] < k:
        pad = k - dk.shape[-1]
        dk = jnp.pad(dk, ((0, 0), (0, pad)), constant_values=1e30)
        rk = jnp.pad(rk, ((0, 0), (0, pad)), constant_values=-1)
    return dk, rk


def build_lsh_index(
    data,
    *,
    num_tables: int = NUM_TABLES,
    num_bits: int = NUM_BITS,
    bucket_cap: Optional[int] = None,
    metric="cosine",
    ids=None,
    seed: int = 42,
    **_ignored,
) -> HybridLSHIndex:
    corpus = as_corpus(data, metric=metric, ids=ids)
    n = corpus.n
    rng = np.random.default_rng(seed)
    # Gaussian hyperplanes over the REAL dims only (padding cols stay 0 so
    # padded vector entries never influence the hash)
    proj = np.zeros((num_tables, corpus.d_pad, num_bits), np.float32)
    proj[:, : corpus.dim, :] = rng.standard_normal(
        (num_tables, corpus.dim, num_bits)).astype(np.float32)

    num_buckets = 1 << num_bits
    if bucket_cap is None:
        avg = max(n // num_buckets, 1)
        bucket_cap = int(min(max(8 * avg, 32), max(n, 32)))

    buckets = np.full((num_tables, num_buckets, bucket_cap), -1, np.int32)
    dropped_slots = 0
    stored = np.zeros(max(n, 1), bool)
    if n:
        scores = np.einsum("nd,tdh->tnh",
                           np.asarray(corpus.vectors[: n]), proj)
        hashes = (scores > 0).astype(np.int64) @ (1 << np.arange(num_bits))
        for ti in range(num_tables):
            h = hashes[ti]
            order = np.argsort(h, kind="stable")
            hs = h[order]
            first = np.searchsorted(hs, hs, side="left")
            pos = np.arange(n) - first
            keep = pos < bucket_cap
            buckets[ti, hs[keep], pos[keep]] = order[keep].astype(np.int32)
            dropped_slots += int((~keep).sum())
            stored[order[keep]] = True
    overflow = {"dropped_slots": dropped_slots,
                "rows_unreachable": int(n - stored[:n].sum()) if n else 0}

    return HybridLSHIndex(
        corpus, proj=jnp.asarray(proj), buckets=jnp.asarray(buckets),
        num_tables=num_tables, num_bits=num_bits, bucket_cap=bucket_cap,
        seed=seed, overflow=overflow)
