#!/usr/bin/env python
"""CPU brute-force baseline — the comparison-table role of the reference's
scripts/benchmark_python_hnswlib.py (same parameters: k=10, cosine), without
requiring hnswlib: measures single-thread and torch-threaded exact search so
the TPU numbers in bench.py have an on-box CPU reference point.

Usage: python scripts/benchmark_cpu_baseline.py [n] [dim]
"""

import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 31173
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    rng = np.random.default_rng(42)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = data[:256]

    # numpy single-thread-ish exact scan
    t0 = time.perf_counter()
    scores = queries @ data.T
    idx = np.argpartition(-scores, 10, axis=1)[:, :10]
    dt = time.perf_counter() - t0
    print(f"numpy exact: {256 / dt:.0f} QPS ({dt * 1e3 / 256:.3f} ms/query)")

    try:
        import torch
        td = torch.from_numpy(data)
        tq = torch.from_numpy(queries)
        torch.topk(tq @ td.T, 10)  # warm
        t0 = time.perf_counter()
        for _ in range(3):
            torch.topk(tq @ td.T, 10)
        dt = (time.perf_counter() - t0) / 3
        print(f"torch ({torch.get_num_threads()} threads) exact: "
              f"{256 / dt:.0f} QPS ({dt * 1e3 / 256:.3f} ms/query)")
    except ImportError:
        print("torch unavailable; skipped threaded baseline")


if __name__ == "__main__":
    sys.exit(main())
