"""Round-5 probe e: why is 1M HNSW recall 0.95, not 0.98?

Builds the 1M graph ONCE, then isolates the recall levers on the same
graph: int8 pack (production) vs PCA-128 bf16 row-gather (pack off — same
scoring precision as a bf16 pack) vs ef ladder vs wider exact re-rank.
If pack-off fast-mode recall matches int8's, the graph is the cap (raise
builder pool/refine); if pack-off recovers, int8 code noise is the cap
(widen re-rank or bf16 pack).

Run: timeout 590 python scripts/_probe_r5e.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    import bench
    from hnsw_tpu.models import build_hnsw_index
    from hnsw_tpu.models.flat import FlatIndex

    n = 1_000_000
    corpus, sample = bench.make_corpus_device(7, n, 768)
    t0 = time.perf_counter()
    idx = build_hnsw_index(corpus, M=16, hierarchy=False, pack_dim=128,
                           large_probe_clusters=4, large_refine_rounds=2)
    print(f"build {time.perf_counter()-t0:.1f}s", flush=True)

    exact = FlatIndex(corpus)
    _, er = exact.search_batch(sample[:1024], 10)
    er = np.asarray(er)

    def rec(label, **kw):
        t0 = time.perf_counter()
        mode = kw.pop("mode", "fast")
        try:
            _, ar = idx.search_batch(sample[:1024], 10, mode, **kw)
            ar = np.asarray(ar)
            r = np.mean([len(set(a.tolist()) & set(x.tolist())) / 10.0
                         for a, x in zip(ar, er)])
            print(f"{label}: recall={r:.4f} ({time.perf_counter()-t0:.1f}s, "
                  f"pack={getattr(idx._nbr_pack, 'dtype', None)})",
                  flush=True)
        except Exception as e:
            print(f"{label}: {type(e).__name__}: {e}", flush=True)

    # production: int8 pack
    rec("int8 pack fast")
    rec("int8 pack balanced", mode="balanced")
    # wider exact re-rank on the same pack
    idx.rerank_mult = 10
    rec("int8 pack fast rerank10")
    idx.rerank_mult = 4
    # pack off: PCA-128 bf16 row-gather scoring (bf16-pack quality signal)
    idx.pack = False
    rec("pack-off (pca128 bf16) fast")
    rec("pack-off (pca128 bf16) balanced", mode="balanced")
    # full-dim bf16 shadow (no PCA): the graph's quality ceiling
    idx.pack = "auto"
    idx.pack_dim = None
    idx._vec_lp = None
    idx._nbr_pack = None
    idx._nbr_sq = None
    idx._nbr_scale = None
    idx._vsq_lp = None
    idx.pack = False
    rec("full-dim bf16 rows fast")


if __name__ == "__main__":
    main()
