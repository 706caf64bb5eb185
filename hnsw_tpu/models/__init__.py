"""Index families. The reference implements eight behind one protocol
(SURVEY.md §0); they are populated here incrementally."""

from hnsw_tpu.models.base import ANNIndex
from hnsw_tpu.models.flat import FlatIndex, build_flat_index

FAMILIES = {
    "flat": build_flat_index,
}
