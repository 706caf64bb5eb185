"""IVF-FLAT: k-means coarse quantizer + flat cluster scan.

Reference: src/hnsw/ann/partition/ivf_flat.clj — k-means++ init (:32-60),
10-iteration Lloyd (:92-131), parallel norm precompute (:161-179), search
routes each query to its num-probes nearest centroids and brute-force scans
them, fetching 2k per partition then taking a global top-k (:217-294). Mode
presets :turbo 1 probe ... :precise 12 (:243-247); default 24 partitions.

TPU design: assignment and cluster scans are MXU GEMMs; partitions live as
contiguous slabs of a cluster-sorted permutation so a probe is a
dynamic_slice (see models/_partition_scan.py). The merge is an exact top-k
over all probed slabs — a strict superset of the reference's 2k-per-partition
fetch, so recall can only be equal or better at the same probe count.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from hnsw_tpu.config import IVF_FLAT_PROBES, Mode
from hnsw_tpu.models._partition_scan import (
    PartitionTable, probe_mask_from_centroids, scan_search,
)
from hnsw_tpu.models.base import ANNIndex
from hnsw_tpu.models.common import as_corpus
from hnsw_tpu.ops.kmeans import random_partition, train_kmeans
from hnsw_tpu.types import Corpus, Metric


class IVFFlatIndex(ANNIndex):
    family = "ivf_flat"

    def __init__(self, corpus: Corpus, table: PartitionTable, *,
                 partitioning: str = "kmeans", seed: int = 42):
        super().__init__(corpus)
        self.table = table
        self.partitioning = partitioning
        self.seed = seed

    def search_batch(self, queries, k: int, mode: Mode = Mode.BALANCED,
                     num_probes: Optional[int] = None):
        q = self.corpus.pad_queries(queries)
        if num_probes is None:
            num_probes = IVF_FLAT_PROBES[Mode.coerce(mode)]
        mask, _ = probe_mask_from_centroids(
            q, self.table.centroids, num_probes=num_probes,
            metric=self.corpus.metric)
        return scan_search(
            self.table.vectors, self.table.v_sq, self.table.perm,
            self.table.starts, self.table.lens, mask, q,
            k=k, cmax=self.table.cmax, metric=self.corpus.metric)

    def index_info(self) -> Dict[str, Any]:
        sizes = self.table.partition_sizes()
        return {
            "type": self.family,
            "num_vectors": self.corpus.n,
            "dimensions": self.corpus.dim,
            "metric": self.corpus.metric.value,
            "num_partitions": self.table.k_parts,
            "partitioning": self.partitioning,
            "partition_sizes": {"min": int(sizes.min()) if len(sizes) else 0,
                                "max": int(sizes.max()) if len(sizes) else 0,
                                "avg": float(sizes.mean()) if len(sizes) else 0.0},
        }

    def to_state(self) -> Dict[str, Any]:
        t = self.table
        return {
            "params": {"partitioning": self.partitioning, "seed": self.seed,
                       "cmax": t.cmax, "k_parts": t.k_parts},
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
        host_vec = np.asarray(corpus.vectors)
        n_slab = len(perm)
        permuted = np.zeros((n_slab, corpus.d_pad), np.float32)
        v_sq = np.zeros(n_slab, np.float32)
        ok = perm >= 0
        permuted[ok] = host_vec[perm[ok]]
        v_sq[ok] = np.asarray(corpus.sq_norms)[perm[ok]]
        table = PartitionTable(
            vectors=jnp.asarray(permuted), v_sq=jnp.asarray(v_sq),
            perm=jnp.asarray(perm), starts=jnp.asarray(a["starts"]),
            lens=jnp.asarray(a["lens"]), centroids=jnp.asarray(a["centroids"]),
            cmax=int(p["cmax"]), k_parts=int(p["k_parts"]),
        )
        return cls(corpus, table, partitioning=p.get("partitioning", "kmeans"),
                   seed=int(p.get("seed", 42)))


def build_ivf_flat_index(
    data,
    *,
    num_partitions: int = 24,      # reference default (ivf_flat.clj)
    partitioning: str = "kmeans",  # "kmeans" | "random" (ivf_flat.clj:191-195)
    max_iterations: int = 10,      # fixed Lloyd iterations (ivf_flat.clj:92)
    metric="cosine",
    ids=None,
    seed: int = 42,
    **_ignored,
) -> IVFFlatIndex:
    corpus = as_corpus(data, metric=metric, ids=ids)
    k = max(1, min(num_partitions, max(corpus.n, 1)))
    if corpus.n == 0:
        assign = np.zeros(0, np.int32)
        cents = np.zeros((k, corpus.dim), np.float32)
    elif partitioning == "random":
        assign = random_partition(corpus.n, k, seed)
        cents = None
    else:
        cents_j, assign_j = train_kmeans(
            corpus.vectors, corpus.sq_norms, corpus.n,
            k=k, seed=seed, iters=max_iterations, metric=corpus.metric)
        assign = np.asarray(assign_j)[: corpus.n]
        cents = np.asarray(cents_j)
    table = PartitionTable.build(corpus, assign, centroids=cents)
    return IVFFlatIndex(corpus, table, partitioning=partitioning, seed=seed)
