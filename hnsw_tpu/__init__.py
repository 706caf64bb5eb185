"""hnsw_tpu — a TPU-native approximate-nearest-neighbor index-and-query engine.

Built from scratch in JAX/XLA/Pallas with the full capability surface of the
reference library (damesek/hnsw-clj, see SURVEY.md): eight ANN index families
behind one unified protocol-based API, cosine/euclidean/dot metrics, five-tier
speed/recall mode presets, batch + filtered search, save/load persistence, a
recall-vs-exact benchmark harness and an interactive search shell.
"""

from hnsw_tpu.types import Corpus, Metric, SearchResult
from hnsw_tpu.config import Mode, DEFAULTS

__version__ = "0.1.0"
