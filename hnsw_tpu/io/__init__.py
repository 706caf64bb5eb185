"""Persistence and data pipeline: index save/load, corpus loaders,
seeded synthetic data generation."""

from hnsw_tpu.io.persist import save_index, load_index, index_exists
from hnsw_tpu.io.datagen import generate_vectors, DIMENSION_PRESETS, SIZE_PRESETS
from hnsw_tpu.io.loader import load_json_corpus, get_best_available_data

__all__ = [
    "save_index", "load_index", "index_exists",
    "generate_vectors", "DIMENSION_PRESETS", "SIZE_PRESETS",
    "load_json_corpus", "get_best_available_data",
]
