"""Round-5 probe: partitioned-HNSW build diagnosis + search mid-ladder tune
(VERDICT r4 items 1 and 4).

Build: two consecutive builds (cold-incl-compile, then warm) with per-stage
ticks — r4's artifact recorded one 148.8 s cold build with no breakdown;
the suspected costs are remote compiles + the host-side 96 MB corpus fetch
(now a device gather).

Search: the mid-ladder sweep. Note expand=8 makes the hop width c=512*...
= 256, which fails hop_score_eligible's VMEM check at 768d — partitioned
has been running the XLA block-gather hop path (~46 GB/s) while plain HNSW
(expand=4, c=128) rides the ring-DMA Pallas kernel (~615 GB/s). The sweep
crosses (ef, expand) to find a >=0.98-recall point at >=8k QPS.

Run: timeout 570 python scripts/_probe_r5b.py [build|tune]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N, D = 31173, 768


class V:
    qps_scan_safe = False

    def __init__(self, idx, ef, expand, kpp=None):
        self.idx, self.ef, self.expand, self.kpp = idx, ef, expand, kpp
        self.corpus = idx.corpus

    def search_batch(self, q, k, mode="balanced"):
        self.idx.expand = self.expand
        return self.idx.search_batch(q, k, mode, ef=self.ef,
                                     k_per_partition=self.kpp)


def main():
    import bench
    from hnsw_tpu.bench.harness import (run_recall_benchmark,
                                        run_search_benchmark)
    from hnsw_tpu.models import build_partitioned_hnsw
    from hnsw_tpu.models.flat import FlatIndex

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    corpus, sample = bench.make_corpus_device(42, N, D)
    data = sample  # 4096 corpus rows, queries drawn from them

    stages = {}

    def build_once():
        marks = []
        t0 = time.perf_counter()
        g = build_partitioned_hnsw(
            corpus, num_partitions=8,
            progress=lambda s, f: marks.append((s, f, time.perf_counter())))
        total = time.perf_counter() - t0
        stages.clear()
        for (s0, _, ta), (_, _, tb) in zip(marks, marks[1:]):
            key = s0.split("_l")[0] if "_l" in s0 else s0
            stages[key] = round(stages.get(key, 0.0) + (tb - ta), 3)
        return g, total

    if which in ("build", "both"):
        idx, cold = build_once()
        print(f"cold build {cold:.2f}s stages={stages}", flush=True)
        idx, warm = build_once()
        print(f"warm build {warm:.2f}s stages={stages}", flush=True)
        idx2, warm2 = build_once()
        print(f"warm build2 {warm2:.2f}s stages={stages}", flush=True)
    else:
        idx, warm = build_once()
        print(f"build {warm:.2f}s", flush=True)

    if which in ("tune", "both"):
        exact = FlatIndex(corpus)
        _, er = exact.search_batch(data[:1024], 10)
        er = np.asarray(er)
        combos = [
            (500, 8, 10, False),   # current :precise (baseline)
            (350, 8, None, False),
            (500, 4, 10, False),   # pallas-eligible hop width
            (350, 4, None, False),
            (300, 4, None, False),
            (256, 4, None, False),
            # force-pallas at c=256: the eligibility VMEM estimate may be
            # conservative — let Mosaic be the judge
            (500, 8, 10, True),
            (350, 8, None, True),
        ]
        from hnsw_tpu.ops import pallas_hop
        orig_elig = pallas_hop.hop_score_eligible
        for ef, e, kpp, force in combos:
            pallas_hop.hop_score_eligible = \
                (lambda *a, **k: True) if force else orig_elig
            try:
                v = V(idx, ef, e, kpp)
                _, ar = v.search_batch(data[:1024], 10)
                ar = np.asarray(ar)
                rec = np.mean([len(set(a.tolist()) & set(x.tolist())) / 10.0
                               for a, x in zip(ar, er)])
                perf = run_search_benchmark(v, data[:1024], k=10,
                                            batch_size=1024, warmup=1,
                                            iters=4, single_query_iters=0)
                print(f"ef={ef} expand={e} kpp={kpp} force={force}: "
                      f"recall={rec:.4f} "
                      f"qps={perf.get('qps_device') or 0:.0f}", flush=True)
            except Exception as ex:
                print(f"ef={ef} expand={e} force={force}: "
                      f"{type(ex).__name__}: {ex}", flush=True)
            finally:
                pallas_hop.hop_score_eligible = orig_elig


if __name__ == "__main__":
    main()
