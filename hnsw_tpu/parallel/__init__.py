"""Multi-chip parallel runtime.

The reference's entire parallel story is in-process Java thread pools
(helper/parallel_search.clj:15-49 query fan-out; partitioned_hnsw.clj:170-196
partition fan-out + barrier + merge) and it lists "Distributed index support"
as an unimplemented TODO (reference README.md:178). The TPU-native
equivalent: corpus/partition axes shard over a jax.sharding.Mesh, per-chip
search runs under shard_map, and the top-k merge is an ICI all-gather +
local reselect (SURVEY.md §2.5 taxonomy).
"""

from hnsw_tpu.parallel.mesh import make_mesh, device_count
from hnsw_tpu.parallel.sharded import (
    sharded_exact_topk,
    ShardedFlatIndex,
    ShardedIVFFlat,
    ShardedPartitionedHNSW,
)
from hnsw_tpu.parallel.build import build_partitioned_hnsw_sharded

__all__ = [
    "make_mesh", "device_count",
    "sharded_exact_topk", "ShardedFlatIndex", "ShardedIVFFlat",
    "ShardedPartitionedHNSW", "build_partitioned_hnsw_sharded",
]
