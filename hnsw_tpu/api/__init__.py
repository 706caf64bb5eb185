"""Unified API: one entry point over all eight index families.

The reference's api/unified.clj extends the ANNIndex protocol onto every
index record and auto-detects the type by instance? (:101-112), exposing
search-knn / index-info / index-type (:137-152). Same surface here, plus the
build dispatcher the reference spreads across per-family namespaces, and the
auto-sizing helper its broken simd_wrapper.clj:171-196 intended
(build-best-for-size: <1k -> hnsw, <10k -> partitioned, else IVF-FLAT).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

from hnsw_tpu.config import Mode
from hnsw_tpu.io.persist import index_exists, load_index, save_index
from hnsw_tpu.models import FAMILIES, ANNIndex


def build_index(data, index_type: str = "hnsw", **opts) -> ANNIndex:
    """Build any index family by name: flat, hnsw, partitioned_hnsw,
    lightning, ivf_flat, ivf_hnsw, hybrid_lsh, pcaf (+ reference aliases).
    Common opts: metric=, ids=, seed=; family opts per builder."""
    key = str(index_type).lstrip(":").lower().replace("-", "_")
    if key not in FAMILIES:
        raise ValueError(
            f"unknown index type {index_type!r}; one of {sorted(set(FAMILIES))}")
    return FAMILIES[key](data, **opts)


def build_best_for_size(data, policy: str = "tpu", **opts) -> ANNIndex:
    """Auto-select a family by corpus size.

    policy="tpu" (default) follows THIS engine's measured rankings
    (bench.py round-5 artifacts, README "Measured" tables): the coarse-only
    int8 fused scan is the fastest >=0.98-recall engine at every size up to
    at least 1M rows on one v5e (1.91M QPS at 31k .. 87k at 1M, always
    above the graph/IVF families), so "best" is the flat int8 engine until
    the corpus outgrows a single chip's exact-scan budget, then HNSW (the
    compute-skipping engine whose advantage grows with N).

    policy="reference" reproduces the reference wrapper's documented
    sizing table (simd_wrapper.clj:171-196: <1k ultra-fast, <10k
    partitioned, else IVF-FLAT).
    """
    n = len(data) if not hasattr(data, "n") else data.n
    if policy == "reference":
        if n < 1000:
            return build_index(data, "hnsw", **opts)
        if n < 10000:
            return build_index(data, "partitioned_hnsw", **opts)
        return build_index(data, "ivf_flat", **opts)
    if n <= 2_000_000:
        return build_index(data, "flat", precision="int8",
                           **{"int8_fetch": 0, **opts})
    return build_index(data, "hnsw", **opts)


def search_knn(index: ANNIndex, query, k: int = 10,
               mode: Mode = Mode.BALANCED) -> List[dict]:
    """Single-query search, reference result shape [{'id','distance'},...]
    ascending (unified.clj:137-143)."""
    return index.search(query, k, mode)


def batch_search_knn(index: ANNIndex, queries, k: int = 10,
                     mode: Mode = Mode.BALANCED) -> List[List[dict]]:
    """BatchSearchIndex (protocol.clj:58-67) — natively batched on TPU."""
    return index.search_many(queries, k, mode)


def filtered_search_knn(index: ANNIndex, query, k: int,
                        predicate: Callable[[Any], bool],
                        mode: Mode = Mode.BALANCED) -> List[dict]:
    """FilterableIndex via over-fetch + post-filter (protocol.clj:97-102)."""
    return index.search_filtered(query, k, predicate, mode)


def index_info(index: ANNIndex) -> Dict[str, Any]:
    return index.index_info()


def index_type(index: ANNIndex) -> str:
    """Auto-detected family name (unified.clj:101-112)."""
    return index.index_type


# capability predicates (protocol.clj:73-86)
def supports_batch(index: ANNIndex) -> bool:
    return index.supports_batch


def supports_filter(index: ANNIndex) -> bool:
    return index.supports_filter


def supports_persistence(index: ANNIndex) -> bool:
    return index.supports_persistence


__all__ = [
    "build_index", "build_best_for_size",
    "search_knn", "batch_search_knn", "filtered_search_knn",
    "index_info", "index_type",
    "save_index", "load_index", "index_exists",
    "supports_batch", "supports_filter", "supports_persistence",
]
