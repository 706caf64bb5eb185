"""IVF-FLAT: k-means coarse quantizer + flat cluster scan.

Reference: src/hnsw/ann/partition/ivf_flat.clj — k-means++ init (:32-60),
10-iteration Lloyd (:92-131), parallel norm precompute (:161-179), search
routes each query to its num-probes nearest centroids and brute-force scans
them, fetching 2k per partition then taking a global top-k (:217-294). Mode
presets :turbo 1 probe ... :precise 12 (:243-247); default 24 partitions.

TPU design: assignment and cluster scans are MXU GEMMs; partitions live as
contiguous slabs of a cluster-sorted permutation. Two search paths:

- masked slab scan (models/_partition_scan.py:scan_search) — streams the
  whole corpus once per batch; best when probes cover a large fraction.
- grouped probe scan (grouped_search) — queries grouped per cluster so
  FLOPs scale with the probed fraction; the path that beats the flat scan
  at large N.

Beyond the reference, recall hardening: capacity-balanced assignment
(ops/kmeans.py:balanced_assign) and optional SOAR-style multi-assignment
(`spill`), with duplicate-aware merges.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from hnsw_tpu.config import IVF_FLAT_PROBES, Mode
from hnsw_tpu.models._partition_scan import (
    PartitionTable, default_qcap, grouped_search, probe_mask_from_centroids,
    scan_search,
)
from hnsw_tpu.models.base import ANNIndex
from hnsw_tpu.models.common import as_corpus
from hnsw_tpu.ops.kmeans import (
    balanced_assign, random_partition, spill_assign, topc_clusters,
    train_kmeans,
)
from hnsw_tpu.types import Corpus, Metric


class IVFFlatIndex(ANNIndex):
    family = "ivf_flat"

    def __init__(self, corpus: Corpus, table: PartitionTable, *,
                 partitioning: str = "kmeans", seed: int = 42,
                 spill: int = 0):
        super().__init__(corpus)
        self.table = table
        self.partitioning = partitioning
        self.seed = seed
        self.spill = spill
        self._last_dropped = 0  # grouped-path qcap drops (see index_info)

    def search_batch(self, queries, k: int, mode: Mode = Mode.BALANCED,
                     num_probes: Optional[int] = None, scan: str = "auto"):
        """scan: "auto" | "grouped" | "full". "grouped" skips un-probed
        compute (wins when probes/partitions is small); "full" streams every
        slab with a probe mask (wins when probes cover most partitions)."""
        q = self.corpus.pad_queries(queries)
        if num_probes is None:
            num_probes = IVF_FLAT_PROBES[Mode.coerce(mode)]
        t = self.table
        p = min(num_probes, t.k_parts)
        copies = 1 + (1 if self.spill else 0)
        if scan == "auto":
            # grouped FLOPs ~ 4*B*P*cmax*D vs full B*N_slab*D; with balanced
            # slabs cmax ~ 1.25*copies*N/K, so grouped wins when ~5*c*P < K
            scan = "grouped" if 5 * copies * p <= t.k_parts else "full"
        mask, probe_ids = probe_mask_from_centroids(
            q, t.centroids, num_probes=p, metric=self.corpus.metric)
        if scan == "grouped":
            qcap = default_qcap(q.shape[0], p, t.k_parts)
            precision = ("default" if self.corpus.metric == Metric.COSINE
                         else "highest")
            d, r, dropped = grouped_search(
                t.vectors, t.v_sq, t.perm, t.starts, t.lens, probe_ids, q,
                k=k, cmax=t.cmax, qcap=qcap, metric=self.corpus.metric,
                precision=precision)
            self._last_dropped = dropped  # device scalar; read lazily
            return d, r
        return scan_search(
            t.vectors, t.v_sq, t.perm, t.starts, t.lens, mask, q,
            k=k, cmax=t.cmax, metric=self.corpus.metric,
            dedup=self.spill > 0)

    def index_info(self) -> Dict[str, Any]:
        sizes = self.table.partition_sizes()
        return {
            "type": self.family,
            "num_vectors": self.corpus.n,
            "dimensions": self.corpus.dim,
            "metric": self.corpus.metric.value,
            "num_partitions": self.table.k_parts,
            "partitioning": self.partitioning,
            "spill": self.spill,
            "cmax": self.table.cmax,
            "last_grouped_dropped_pairs": int(self._last_dropped),
            "partition_sizes": {"min": int(sizes.min()) if len(sizes) else 0,
                                "max": int(sizes.max()) if len(sizes) else 0,
                                "avg": float(sizes.mean()) if len(sizes) else 0.0},
        }

    def to_state(self) -> Dict[str, Any]:
        t = self.table
        return {
            "params": {"partitioning": self.partitioning, "seed": self.seed,
                       "cmax": t.cmax, "k_parts": t.k_parts,
                       "spill": self.spill,
                       "table_dtype": ("bf16" if t.vectors.dtype ==
                                       jnp.bfloat16 else "f32")},
            "arrays": {
                "perm": np.asarray(t.perm), "starts": np.asarray(t.starts),
                "lens": np.asarray(t.lens),
                "centroids": np.asarray(t.centroids),
            },
        }

    @classmethod
    def from_state(cls, corpus: Corpus, state: Dict[str, Any]) -> "IVFFlatIndex":
        p, a = state["params"], state["arrays"]
        perm = np.asarray(a["perm"])
        tdt = jnp.bfloat16 if p.get("table_dtype") == "bf16" else jnp.float32
        # device row-gather, not a host-side corpus fetch (the corpus may
        # live across a slow device link)
        perm_j = jnp.asarray(perm)
        ok = (perm_j >= 0)
        permuted = jnp.where(
            ok[:, None],
            jnp.take(corpus.vectors, jnp.maximum(perm_j, 0), axis=0), 0.0
        ).astype(tdt)
        v_sq = jnp.where(ok, jnp.take(corpus.sq_norms,
                                      jnp.maximum(perm_j, 0), axis=0), 0.0)
        table = PartitionTable(
            vectors=permuted, v_sq=v_sq,
            perm=jnp.asarray(perm), starts=jnp.asarray(a["starts"]),
            lens=jnp.asarray(a["lens"]), centroids=jnp.asarray(a["centroids"]),
            cmax=int(p["cmax"]), k_parts=int(p["k_parts"]),
        )
        return cls(corpus, table, partitioning=p.get("partitioning", "kmeans"),
                   seed=int(p.get("seed", 42)), spill=int(p.get("spill", 0)))


def build_ivf_flat_index(
    data,
    *,
    num_partitions: int = 24,      # reference default (ivf_flat.clj)
    partitioning: str = "kmeans",  # "kmeans" | "random" (ivf_flat.clj:191-195)
    max_iterations: int = 10,      # fixed Lloyd iterations (ivf_flat.clj:92)
    metric="cosine",
    ids=None,
    seed: int = 42,
    spill: int = 0,                # 1 = SOAR-style secondary assignment
    balance: float = 1.25,         # cluster-size cap factor (0 = unbalanced)
    table_dtype: str = "auto",     # "auto" | "f32" | "bf16" slab storage.
                                   # auto: bf16 above 600k rows for
                                   # cosine/dot (halves the permuted slab
                                   # copy - what lets IVF fit 1M rows on a
                                   # 16 GB chip; the grouped scan scores
                                   # bf16 there anyway), f32 otherwise
    **_ignored,
) -> IVFFlatIndex:
    import jax.numpy as _jnp
    corpus = as_corpus(data, metric=metric, ids=ids)
    if table_dtype == "auto":
        table_dtype = "bf16" if (corpus.n > 600_000
                                 and corpus.metric != Metric.EUCLIDEAN) \
            else "f32"
    tdt = _jnp.bfloat16 if table_dtype == "bf16" else _jnp.float32
    k = max(1, min(num_partitions, max(corpus.n, 1)))
    secondary = None
    if corpus.n == 0:
        assign = np.zeros(0, np.int32)
        cents = np.zeros((k, corpus.dim), np.float32)
    elif partitioning == "random":
        assign = random_partition(corpus.n, k, seed)
        cents = None
    else:
        cents_j, _ = train_kmeans(
            corpus.vectors, corpus.sq_norms, corpus.n,
            k=k, seed=seed, iters=max_iterations, metric=corpus.metric)
        cents = np.asarray(cents_j)
        c_width = min(max(4, 1 + (1 if spill else 0)), k)
        topd, topi = topc_clusters(corpus.vectors, corpus.sq_norms, corpus.n,
                                   cents_j, c=c_width, metric=corpus.metric)
        if balance and k > 1:
            cap = int(math.ceil(balance * corpus.n / k))
            assign = balanced_assign(topd, topi, k, cap)
        else:
            cap = corpus.n
            assign = topi[:, 0].astype(np.int32)
        if spill and k > 1:
            secondary = spill_assign(assign, topd, topi, k, cap)
    table = PartitionTable.build(corpus, assign, centroids=cents,
                                 secondary=secondary, dtype=tdt)
    return IVFFlatIndex(corpus, table, partitioning=partitioning, seed=seed,
                        spill=spill if secondary is not None else 0)
