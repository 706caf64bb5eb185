"""Lightning: instant-build partition scan.

Reference: src/hnsw/ann/partition/lightning.clj — random equal split
(default, :125-129) or k-means++ "smart" partitioning (:86-122); one centroid
per partition; search picks `percent` of partitions by centroid distance (or
randomly when use-centroids is false) and brute-force scans them with
precomputed-norm cosine (:144-187). The partition-count-adaptive mode matrix
(:198-229) maps :turbo..:precise to a scan percentage keyed on the partition
count; default 32 partitions at build, 24 in benchmarks. Build time in the
reference is ~61 ms because build does almost nothing — same here (a
permutation and optional k-means++ seeding).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional


import jax.numpy as jnp
import numpy as np

from hnsw_tpu.config import Mode, lightning_percent
from hnsw_tpu.models._partition_scan import (
    PartitionTable, probe_mask_from_centroids, scan_search,
)

from hnsw_tpu.models.common import as_corpus
from hnsw_tpu.models.ivf_flat import IVFFlatIndex
from hnsw_tpu.ops.kmeans import random_partition, train_kmeans
from hnsw_tpu.types import Corpus


class LightningIndex(IVFFlatIndex):
    """Shares the slab-scan machinery with IVF-FLAT; differs in build
    (near-zero cost) and probe selection (percent schedule / random)."""

    family = "lightning"

    def __init__(self, corpus: Corpus, table: PartitionTable, *,
                 partitioning: str = "random", use_centroids: bool = True,
                 seed: int = 42):
        super().__init__(corpus, table, partitioning=partitioning, seed=seed)
        self.use_centroids = use_centroids
        self._rng = np.random.default_rng(seed)

    def search_batch(self, queries, k: int, mode: Mode = Mode.BALANCED,
                     percent: Optional[float] = None):
        q = self.corpus.pad_queries(queries)
        kp = self.table.k_parts
        if percent is None:
            percent = lightning_percent(mode, kp)
        probes = max(1, min(kp, math.ceil(percent * kp)))
        if self.use_centroids:
            mask, _ = probe_mask_from_centroids(
                q, self.table.centroids, num_probes=probes,
                metric=self.corpus.metric)
        else:
            # random partition choice per query (lightning.clj:152-158):
            # batched Gumbel-top-k — uniform sampling without replacement
            # for the whole batch in one shot, no per-query host loop
            b = q.shape[0]
            g = self._rng.gumbel(size=(b, kp))
            sel = np.argpartition(-g, probes - 1, axis=1)[:, :probes]
            mask_np = np.zeros((b, kp), bool)
            np.put_along_axis(mask_np, sel, True, axis=1)
            mask = jnp.asarray(mask_np)
        return scan_search(
            self.table.vectors, self.table.v_sq, self.table.perm,
            self.table.starts, self.table.lens, mask, q,
            k=k, cmax=self.table.cmax, metric=self.corpus.metric)

    def index_info(self) -> Dict[str, Any]:
        info = super().index_info()
        info["type"] = self.family
        info["use_centroids"] = self.use_centroids
        return info

    def to_state(self) -> Dict[str, Any]:
        s = super().to_state()
        s["params"]["use_centroids"] = self.use_centroids
        return s

    @classmethod
    def from_state(cls, corpus: Corpus, state: Dict[str, Any]) -> "LightningIndex":
        base = IVFFlatIndex.from_state(corpus, state)
        p = state["params"]
        return cls(corpus, base.table, partitioning=base.partitioning,
                   use_centroids=bool(p.get("use_centroids", True)),
                   seed=base.seed)


def build_lightning_index(
    data,
    *,
    num_partitions: int = 32,       # reference build default (lightning.clj)
    partitioning: str = "random",   # "random" | "smart" (k-means++)
    use_centroids: bool = True,
    metric="cosine",
    ids=None,
    seed: int = 42,
    **_ignored,
) -> LightningIndex:
    corpus = as_corpus(data, metric=metric, ids=ids)
    k = max(1, min(num_partitions, max(corpus.n, 1)))
    cents = None
    if corpus.n == 0:
        assign = np.zeros(0, np.int32)
        cents = np.zeros((k, corpus.dim), np.float32)
    elif partitioning in ("smart", "kmeans"):
        cents_j, assign_j = train_kmeans(
            corpus.vectors, corpus.sq_norms, corpus.n,
            k=k, seed=seed, iters=3, metric=corpus.metric)
        assign = np.asarray(assign_j)[: corpus.n]
        cents = np.asarray(cents_j)
    else:
        assign = random_partition(corpus.n, k, seed)
    table = PartitionTable.build(corpus, assign, centroids=cents)
    return LightningIndex(corpus, table, partitioning=partitioning,
                          use_centroids=use_centroids, seed=seed)
