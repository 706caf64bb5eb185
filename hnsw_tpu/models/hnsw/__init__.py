"""HNSW index family: the production graph index.

Covers both of the reference's graph families — pure HNSW (graph.clj +
ann/graph/pure_hnsw.clj) and Ultra-Fast HNSW (ultra_fast.clj) — with one
TPU-native implementation: MXU exact-candidate build (build.py) and batched
fixed-beam search (search.py). Mode presets map to ef exactly as documented
in pure_hnsw.clj:136-141, and ef is actually honored (fixing the
graph.clj:304 quirk where ef was hardcoded to max(k, 50)).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hnsw_tpu.config import DEFAULTS, Mode, ef_for
from hnsw_tpu.models.base import ANNIndex
from hnsw_tpu.models.common import as_corpus
from hnsw_tpu.models.hnsw.build import build_graph, insert_wave
from hnsw_tpu.models.hnsw.graph import HNSWGraph, assign_levels, empty_graph
from hnsw_tpu.models.hnsw.search import (hnsw_search_batch, pack_neighbors,
                                         sample_entries)
from hnsw_tpu.types import Corpus, Metric


class HNSWIndex(ANNIndex):
    family = "hnsw"

    # scan-wrapping the hop loop's while_loop program has crashed the dev
    # relay's remote compiler; the bench harness measures sustained QPS for
    # this family with an async dispatch pipeline instead (bench/harness.py)
    qps_scan_safe = False

    # neighborhood-contiguous block packing (see search.pack_neighbors) is
    # enabled while the duplicated bf16 table fits this budget — beyond it
    # (~130k rows at 768d, M0=32) the search falls back to row gathers
    PACK_BYTES_CAP = 6 << 30

    def __init__(self, corpus: Corpus, graph: HNSWGraph, *,
                 expand: int = 4, entry_mode: str = "sample",
                 entry_sample: int = 512, precision: str = "auto",
                 pack: str | bool = "auto", hop_kernel: str | None = "auto",
                 pack_dim: Optional[int] = None, rerank_mult: int = 4,
                 pack_precision: str = "auto"):
        super().__init__(corpus)
        self.graph = graph
        self.expand = expand
        self.entry_mode = entry_mode
        self.entry_sample = entry_sample
        self.precision = precision
        self.pack = pack
        self.hop_kernel = hop_kernel
        # pack_precision: dtype of the packed-neighborhood table. "bf16" is
        # the default shadow; "int8" stores per-row-quantized codes + scales
        # (search.pack_neighbors_int8) at HALF the bf16 pack's HBM — what
        # lets the graph engine reach 1M rows on one 16 GB chip (bf16
        # PCA-128 at 1M = 8.2 GB of pack alone). "auto" picks bf16 while it
        # fits PACK_BYTES_CAP, else int8.
        self.pack_precision = pack_precision
        # pack_dim: score hops against a seeded random projection of the
        # corpus (JL/PCAF-style, pcaf.clj:33-46 semantics) instead of the
        # full-dim bf16 shadow: D/pack_dim x less hop HBM traffic, and the
        # packed-neighbor table for corpora whose full-dim pack exceeds
        # HBM (e.g. 500k x 768 x M0=32 bf16 = 24 GB; at 256d it is 8 GB).
        # The final re-rank widens to ~4k beam entries at full dimension.
        self.pack_dim = pack_dim
        # exact re-rank window = rerank_mult * k (clamped to ef): widen for
        # reduced-dim packs whose in-loop ordering is noisier
        self.rerank_mult = rerank_mult
        self._sample_rows = None
        self._vec_lp = None
        self._proj = None
        self._vsq_lp = None
        self._nbr_pack = None
        self._nbr_sq = None
        self._nbr_scale = None

    def _entry_rows(self) -> jnp.ndarray:
        if self._sample_rows is None or \
                self._sample_rows.shape[0] > max(self.graph.n, 1):
            s = min(self.entry_sample, max(self.graph.n, 1))
            rows = np.unique(np.linspace(0, max(self.graph.n - 1, 0), s)
                             .astype(np.int32))
            self._sample_rows = jnp.asarray(rows)
        return self._sample_rows

    def search_batch(self, queries, k: int, mode: Mode = Mode.BALANCED,
                     ef: Optional[int] = None):
        q = self.corpus.pad_queries(queries)
        if self.graph.n == 0 or self.graph.entry < 0:
            b = q.shape[0]
            return (jnp.full((b, k), np.float32(np.inf)),
                    jnp.full((b, k), -1, jnp.int32))
        ef = ef if ef is not None else ef_for(mode, k)
        # "auto": bf16-class loop scoring is safe for cosine (normalized,
        # bounded error, exact final re-rank) but the euclidean norm formula
        # cancels catastrophically at bf16 — keep full f32 there
        precision = self.precision if self.precision != "auto" else (
            "default" if self.corpus.metric == Metric.COSINE else "highest")
        if self.entry_mode == "sample":
            # one GEMM against a row sample replaces the serial upper-layer
            # descent (see sample_entries); the hierarchy stays available
            # via entry_mode="hierarchy"
            entries, _ = sample_entries(
                self.corpus.vectors, self.corpus.sq_norms,
                self._entry_rows(), q, metric=self.corpus.metric)
            upper = self.graph.adj_upper[:0]
        else:
            entries = jnp.full((q.shape[0],), self.graph.entry, jnp.int32)
            upper = self.graph.adj_upper
        lowdim = (self.pack_dim is not None and precision != "highest"
                  and self.pack_dim < self.corpus.vectors.shape[1])
        loop_dim = self.pack_dim if lowdim else self.corpus.vectors.shape[1]
        queries_lp = None
        v_sq_lp = None
        if lowdim:
            if self._proj is None or self._proj.shape[1] != self.pack_dim:
                # PCA basis, not a random projection: embedding corpora are
                # low-rank, so the top-pack_dim principal subspace preserves
                # neighbor ordering far better than JL (measured on the
                # 4k/768d bench corpus: PCA-256 ~0.996 recall vs JL-256
                # ~0.91). One [D, D] device GEMM + a host eigh.
                vf = self.corpus.vectors
                cov = np.asarray(jnp.dot(
                    vf.T, vf, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
                w, v = np.linalg.eigh(cov)          # ascending eigenvalues
                self._proj = jnp.asarray(
                    v[:, ::-1][:, : self.pack_dim].copy())
                self._vec_lp = None
            if self._vec_lp is None or self._vec_lp.shape != (
                    self.corpus.vectors.shape[0], self.pack_dim):
                self._vec_lp = jnp.dot(
                    self.corpus.vectors, self._proj,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST).astype(jnp.bfloat16)
                vf = self._vec_lp.astype(jnp.float32)
                self._vsq_lp = jnp.sum(vf * vf, axis=-1)
                self._nbr_pack = None
            queries_lp = jnp.dot(q, self._proj,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
            v_sq_lp = self._vsq_lp
        elif self._vec_lp is None or \
                self._vec_lp.shape != self.corpus.vectors.shape:
            self._vec_lp = self.corpus.vectors.astype(jnp.bfloat16)
            self._vsq_lp = None
        # the pack is a quantized shadow (bf16 or int8 codes): full-f32
        # ("highest") scoring — the euclidean auto policy — must keep exact
        # row gathers
        pack_bytes = {
            "bf16": self.graph.n_pad * self.graph.m0 * (loop_dim * 2 + 4),
            "int8": self.graph.n_pad * self.graph.m0 * (loop_dim + 8),
        }
        pp = self.pack_precision
        if pp == "auto":
            pp = "bf16" if pack_bytes["bf16"] <= self.PACK_BYTES_CAP \
                else "int8"
        use_pack = precision != "highest" and (self.pack is True or (
            self.pack == "auto"
            and pack_bytes[pp] <= self.PACK_BYTES_CAP))
        want_dtype = jnp.int8 if pp == "int8" else jnp.bfloat16
        if use_pack and (self._nbr_pack is None
                         or self._nbr_pack.dtype != want_dtype):
            src_sq = self._vsq_lp if lowdim else self.corpus.sq_norms
            if pp == "int8":
                from hnsw_tpu.models.hnsw.search import pack_neighbors_int8
                self._nbr_pack, self._nbr_scale, self._nbr_sq = \
                    pack_neighbors_int8(self._vec_lp, src_sq, self.graph.adj0)
            else:
                self._nbr_pack, self._nbr_sq = pack_neighbors(
                    self._vec_lp, src_sq, self.graph.adj0)
                self._nbr_scale = None
        # "auto": the ring-DMA Pallas kernel sustains ~615 GB/s on the
        # packed-neighborhood gather vs ~46 GB/s for XLA's row gather
        # (scripts/_probe_hop_kernel_r3b.py), but it needs the TPU backend,
        # the pack, and MXU/VPU-aligned shapes
        hop_kernel = self.hop_kernel
        if hop_kernel == "auto":
            from hnsw_tpu.ops.pallas_hop import (hop_score_eligible,
                                                 hop_score_int8_eligible)
            elig_fn = hop_score_int8_eligible if pp == "int8" \
                else hop_score_eligible
            eligible = (jax.default_backend() == "tpu" and use_pack
                        and elig_fn(loop_dim, self.graph.m0,
                                    expand=self.expand, ef=ef))
            hop_kernel = "pallas" if eligible else None
        d, r = hnsw_search_batch(
            self.corpus.vectors, self.corpus.sq_norms,
            self.graph.adj0, upper, entries, q,
            k=k, ef=ef, expand=self.expand,
            metric=self.corpus.metric, precision=precision,
            vectors_lp=self._vec_lp,
            nbr_pack=self._nbr_pack if use_pack else None,
            nbr_sq=self._nbr_sq if use_pack else None,
            nbr_scale=self._nbr_scale if use_pack else None,
            hop_kernel=hop_kernel,
            queries_lp=queries_lp,
            v_sq_lp=v_sq_lp,
            # bf16 shadow scoring reorders near-ties (~0.4% relative vector
            # rounding); re-ranking a rerank_mult*k beam prefix exactly
            # recovers them (measured: partitioned 0.896 -> 1.0 at ef=50)
            # for one small out-of-loop gather
            rerank=self.rerank_mult * k,
        )
        return d, r

    def add_batch(self, data: np.ndarray, ids=None, *, seed_offset: int = 0):
        """Append new vectors and connect them with a batched wave insert —
        the parallel insert the reference attempted and abandoned
        (ultra_fast.clj:303-313)."""
        data = np.atleast_2d(np.asarray(data, np.float32))
        w = data.shape[0]
        old_n = self.corpus.n
        old = np.asarray(self.corpus.vectors[:old_n, : self.corpus.dim])
        merged = np.concatenate([old, data], axis=0)
        new_ids = None
        if self.corpus.ids is not None or ids is not None:
            olds = list(self.corpus.ids) if self.corpus.ids is not None else \
                [str(i) for i in range(old_n)]
            news = [str(i) for i in (ids if ids is not None
                                     else range(old_n, old_n + w))]
            new_ids = olds + news
        self.corpus = Corpus.from_array(merged, metric=self.corpus.metric,
                                        ids=new_ids)
        self._sample_rows = None   # entry sample must cover the new rows
        self._vec_lp = None        # bf16 shadow must track the new corpus
                                   # (shape alone can't detect same-n_pad adds)
        self._nbr_pack = None      # adjacency changed: repack on next search
        self._nbr_sq = None
        self._nbr_scale = None
        self._vsq_lp = None
        self._proj = None          # PCA basis must track the grown corpus —
                                   # a stale basis silently erodes pack_dim
                                   # recall as the data distribution drifts
        new_rows = np.arange(old_n, old_n + w, dtype=np.int32)
        ml = DEFAULTS["ml"]
        new_levels = assign_levels(w, ml, DEFAULTS["seed"] + old_n + seed_offset)
        if self.graph.n == 0:
            self.graph = build_graph(
                self.corpus, m=self.graph.m, m0=self.graph.m0,
                ef_construction=self.graph.ef_construction)
        else:
            self.graph = insert_wave(self.graph, self.corpus, new_rows,
                                     new_levels)
        return self

    def index_info(self) -> Dict[str, Any]:
        info = self.graph.info()
        info.update({
            "type": self.family,
            "num_vectors": self.corpus.n,
            "dimensions": self.corpus.dim,
            "metric": self.corpus.metric.value,
        })
        return info

    def to_state(self) -> Dict[str, Any]:
        g = self.graph
        return {
            "params": {
                "M": g.m, "M0": g.m0, "ef_construction": g.ef_construction,
                "entry": int(g.entry), "max_level": int(g.max_level),
                "n": int(g.n), "expand": self.expand,
                "n_bridges": int(g.n_bridges),
            },
            "arrays": {
                "levels": np.asarray(g.levels),
                "adj0": np.asarray(g.adj0),
                "adj_upper": np.asarray(g.adj_upper),
            },
        }

    @classmethod
    def from_state(cls, corpus: Corpus, state: Dict[str, Any]) -> "HNSWIndex":
        p, a = state["params"], state["arrays"]
        graph = HNSWGraph(
            levels=jnp.asarray(a["levels"]),
            adj0=jnp.asarray(a["adj0"]),
            adj_upper=jnp.asarray(a["adj_upper"]),
            entry=int(p["entry"]), max_level=int(p["max_level"]),
            m=int(p["M"]), m0=int(p["M0"]),
            ef_construction=int(p["ef_construction"]), n=int(p["n"]),
            n_bridges=int(p.get("n_bridges", 0)),
        )
        return cls(corpus, graph, expand=int(p.get("expand", 4)))


def build_hnsw_index(
    data,
    *,
    M: int = DEFAULTS["M"],
    max_M0: Optional[int] = None,
    ef_construction: int = DEFAULTS["ef_construction"],
    metric="cosine",
    ids=None,
    seed: int = DEFAULTS["seed"],
    k_cand: Optional[int] = None,
    expand: int = 4,
    pack_dim: Optional[int] = None,
    pack_precision: str = "auto",
    rerank_mult: int = 4,
    large_probe_clusters: int = 2,
    large_refine_rounds: int = 1,
    hierarchy: bool = True,
    progress=None,
    should_continue=None,
    **_ignored,
) -> HNSWIndex:
    """Build an HNSW index. Accepts [n, dim] arrays, [id, vec] pairs, or a
    Corpus. Defaults mirror the reference (ultra_fast.clj:334-344)."""
    corpus = as_corpus(data, metric=metric, ids=ids)
    if corpus.n == 0:
        graph = empty_graph(corpus.n_pad or 8, M, max_M0 or 2 * M, 0,
                            ef_construction)
    else:
        graph = build_graph(corpus, m=M, m0=max_M0,
                            ef_construction=ef_construction,
                            seed=seed, k_cand=k_cand,
                            large_probe_clusters=large_probe_clusters,
                            large_refine_rounds=large_refine_rounds,
                            hierarchy=hierarchy,
                            progress=progress, should_continue=should_continue)
    return HNSWIndex(corpus, graph, expand=expand, pack_dim=pack_dim,
                     pack_precision=pack_precision, rerank_mult=rerank_mult)


__all__ = ["HNSWIndex", "build_hnsw_index", "HNSWGraph", "build_graph",
           "insert_wave", "hnsw_search_batch"]
