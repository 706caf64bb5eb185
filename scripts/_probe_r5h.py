"""Round-5 probe h: 31k follow-ups.

1. HNSW at 31k with expand=8 (full-dim pack, c=256 — newly Pallas-eligible)
   vs the expand=4 default: same ef, half the hops.
2. A second pool window on the int8 coarse bucket kernel (r5a measured
   2.46M QPS where round 4 recorded 1.91M steady — median evidence).

Run: timeout 570 python scripts/_probe_r5h.py
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

    def search_batch(self, q, k, mode="turbo"):
        self.idx.expand = self.expand
        return self.idx.search_batch(q, k, mode, ef=self.ef)


def main():
    import bench
    from hnsw_tpu.bench.harness import run_search_benchmark
    from hnsw_tpu.models import build_hnsw_index
    from hnsw_tpu.models.flat import FlatIndex

    corpus, sample = bench.make_corpus_device(42, 31173, 768)
    idx = build_hnsw_index(corpus, M=16, hierarchy=False)
    exact = FlatIndex(corpus)
    _, er = exact.search_batch(sample[:1024], 10)
    er = np.asarray(er)

    for ef, e in ((50, 4), (50, 8), (100, 8)):
        try:
            v = V(idx, ef, e)
            _, ar = v.search_batch(sample[:1024], 10)
            ar = np.asarray(ar)
            rec = np.mean([len(set(a.tolist()) & set(x.tolist())) / 10.0
                           for a, x in zip(ar, er)])
            perf = run_search_benchmark(v, sample[:1024], k=10,
                                        batch_size=1024, warmup=1, iters=4,
                                        single_query_iters=0)
            print(f"hnsw ef={ef} e={e}: recall={rec:.4f} "
                  f"qps={perf.get('qps_device') or 0:.0f}", flush=True)
        except Exception as ex:
            print(f"ef={ef} e={e}: {type(ex).__name__}: {ex}", flush=True)

    # int8 coarse window 2
    fi = FlatIndex(corpus, precision="int8", int8_fetch=0)
    q = np.asarray(sample[:4096], np.float32)
    perf = run_search_benchmark(fi, q, k=10, batch_size=4096, warmup=2,
                                iters=6, single_query_iters=0)
    print(f"int8 coarse b=4096 window2: "
          f"qps={perf.get('qps_device') or 0:.0f}", flush=True)


if __name__ == "__main__":
    main()
