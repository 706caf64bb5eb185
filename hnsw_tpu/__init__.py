"""hnsw_tpu — a TPU-native approximate-nearest-neighbor index-and-query engine.

Built from scratch in JAX/XLA/Pallas with the full capability surface of the
reference library (damesek/hnsw-clj, see SURVEY.md): eight ANN index families
behind one unified protocol-based API, cosine/euclidean/dot metrics, five-tier
speed/recall mode presets, batch + filtered search, save/load persistence, a
recall-vs-exact benchmark harness and an interactive search shell.

Where the reference runs hand-unrolled SIMD distance loops on one JVM
(src/hnsw/simd.clj, simd_optimized.clj), this engine keeps the corpus as an
HBM-resident packed matrix and fuses distance + top-k into MXU-sized tiles;
HNSW's greedy traversal (src/hnsw/ultra_fast.clj) becomes batched fixed-beam
frontier expansion over flat int32 adjacency tables; and partition axes shard
across chips over a jax.sharding.Mesh with ICI top-k merges.
"""

from hnsw_tpu.types import Corpus, Metric, SearchResult
from hnsw_tpu.config import Mode, DEFAULTS
from hnsw_tpu.api import (
    build_index,
    build_best_for_size,
    search_knn,
    batch_search_knn,
    filtered_search_knn,
    index_info,
    index_type,
    save_index,
    load_index,
    index_exists,
)
from hnsw_tpu.api.simple import Index
from hnsw_tpu.models import (
    ANNIndex,
    FlatIndex,
    HNSWIndex,
    IVFFlatIndex,
    LightningIndex,
    PartitionedHNSWIndex,
    IVFHNSWIndex,
    HybridLSHIndex,
    PCAFIndex,
    FAMILIES,
)

__version__ = "0.1.0"

__all__ = [
    "Corpus", "Metric", "SearchResult", "Mode", "DEFAULTS",
    "build_index", "build_best_for_size",
    "search_knn", "batch_search_knn", "filtered_search_knn",
    "index_info", "index_type",
    "save_index", "load_index", "index_exists",
    "Index",
    "ANNIndex", "FlatIndex", "HNSWIndex", "IVFFlatIndex", "LightningIndex",
    "PartitionedHNSWIndex", "IVFHNSWIndex", "HybridLSHIndex", "PCAFIndex",
    "FAMILIES",
    "__version__",
]
