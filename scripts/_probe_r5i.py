"""Round-5 probe i: expand=4 vs 8 on the SAME 1M refine-3 graph.

_probe_r5h showed single-graph 31k prefers expand=4 (90.8k vs 64k at
ef=50) while the multi-entry families prefer 8; the 1M rows were only
measured at e=8 (_probe_r5f). Settles the bench's scale-row config.

Run: timeout 1100 python scripts/_probe_r5i.py  (background)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


class V:
    qps_scan_safe = False

    def __init__(self, idx, ef, expand):
        self.idx, self.ef, self.expand = idx, ef, expand
        self.corpus = idx.corpus

    def search_batch(self, q, k, mode="balanced"):
        self.idx.expand = self.expand
        return self.idx.search_batch(q, k, mode, ef=self.ef)


def main():
    import bench
    from hnsw_tpu.bench.harness import run_search_benchmark
    from hnsw_tpu.models import build_hnsw_index
    from hnsw_tpu.models.flat import FlatIndex

    n = 1_000_000
    corpus, sample = bench.make_corpus_device(7, n, 768)
    t0 = time.perf_counter()
    idx = build_hnsw_index(corpus, M=16, hierarchy=False, pack_dim=128,
                           large_probe_clusters=4, large_refine_rounds=3)
    idx.entry_sample = 2048
    print(f"build {time.perf_counter()-t0:.1f}s", flush=True)

    exact = FlatIndex(corpus)
    _, er = exact.search_batch(sample[:1024], 10)
    er = np.asarray(er)

    for ef, e in ((200, 4), (300, 4), (200, 8), (300, 8), (400, 8)):
        try:
            v = V(idx, ef, e)
            _, ar = v.search_batch(sample[:1024], 10)
            ar = np.asarray(ar)
            rec = np.mean([len(set(a.tolist()) & set(x.tolist())) / 10.0
                           for a, x in zip(ar, er)])
            perf = run_search_benchmark(v, sample[:1024], k=10,
                                        batch_size=1024, warmup=1, iters=4,
                                        single_query_iters=0)
            print(f"1M ef={ef} e={e}: recall={rec:.4f} "
                  f"qps={perf.get('qps_device') or 0:.0f}", flush=True)
        except Exception as ex:
            print(f"ef={ef} e={e}: {type(ex).__name__}: {ex}", flush=True)


if __name__ == "__main__":
    main()
