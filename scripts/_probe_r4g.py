"""Round-4 probe G (real TPU): int8 COARSE-ONLY flat scan (no re-rank).

If the per-row-scale int8 ordering alone clears 0.98 recall@10 at 31k, the
headline becomes the int8 MXU rate (394 TOPS v5e = 2x bf16) with the
re-rank's scattered-row gather gone. Measures bf16 / int8+rerank /
int8-coarse in ONE window so the (pool-shared) chip's speed variance
cancels in the ratios.

Run: timeout 1800 python scripts/_probe_r4g.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from bench import make_corpus  # noqa: E402
from hnsw_tpu.bench.harness import (  # noqa: E402
    run_recall_benchmark, run_search_benchmark,
)
from hnsw_tpu.models.flat import FlatIndex  # noqa: E402
from hnsw_tpu.types import Corpus  # noqa: E402


def log(**kw):
    print(json.dumps(kw), flush=True)


t0 = time.time()
data = make_corpus()
corpus = Corpus.from_array(data)
corpus.vectors.block_until_ready()
jax.device_get(corpus.vectors.ravel()[:1])
log(stage="staged", s=round(time.time() - t0, 1))
exact = FlatIndex(corpus)

variants = [
    ("bf16", FlatIndex(corpus, precision="bf16")),
    ("int8_rerank", FlatIndex(corpus, precision="int8")),
    ("int8_coarse", FlatIndex(corpus, precision="int8", int8_fetch=0)),
]
for name, idx in variants:
    rec = run_recall_benchmark(idx, data, k=10, num_queries=1024,
                               exact_index=exact)
    perf = run_search_benchmark(idx, data[:1024], k=10, batch_size=1024,
                                warmup=2, iters=10, single_query_iters=0)
    log(stage="flat", variant=name, recall=round(rec["recall_at_k"], 4),
        qps=round(perf.get("qps_device") or 0.0, 1))

log(stage="done", total_s=round(time.time() - t0, 1))
