"""Compute kernels: fused distance scoring, top-k selection, k-means,
random projections, sign hashing. The TPU-native replacement for the
reference's SIMD distance layer (src/hnsw/simd.clj, simd_optimized.clj)."""

from hnsw_tpu.ops.distance import (
    score_block,
    distances_from_dots,
    gather_score,
    pairwise_distances,
)
from hnsw_tpu.ops.topk import top_k_ascending, merge_topk, mask_invalid

__all__ = [
    "score_block",
    "distances_from_dots",
    "gather_score",
    "pairwise_distances",
    "top_k_ascending",
    "merge_topk",
    "mask_invalid",
]
