"""Test config: run on a virtual 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; see __graft_entry__.py)."""

import os

# Pin tests to a virtual 8-device CPU backend. The environment may force a
# TPU platform via JAX_PLATFORMS (e.g. the axon tunnel), so overriding the
# env var is not enough — set the config before any backend initializes.
#
# HNSW_TPU_REAL=1 keeps the REAL backend instead, for the opt-in on-chip
# kernel smoke tests (tests/test_real_tpu.py): interpret mode cannot catch
# Mosaic's alignment rejections, only a real compile does. Run those alone
# (`HNSW_TPU_REAL=1 python -m pytest tests/test_real_tpu.py -x -q`) — the
# rest of the suite is sized for the CPU backend and would crawl through
# the device relay.
if not os.environ.get("HNSW_TPU_REAL"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_unit(n, d, seed=42):
    r = np.random.default_rng(seed)
    x = r.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def make_clustered(n, d, k=8, seed=42, noise=0.15):
    r = np.random.default_rng(seed)
    centers = r.standard_normal((k, d)).astype(np.float32)
    assign = r.integers(0, k, n)
    x = centers[assign] + noise * r.standard_normal((n, d)).astype(np.float32)
    return x.astype(np.float32)


@pytest.fixture(scope="session")
def unit_vecs_small():
    return make_unit(200, 32)


@pytest.fixture(scope="session")
def clustered_vecs():
    return make_clustered(1000, 64)


def brute_force_knn(data, queries, k, metric="cosine"):
    """Reference-grade exact kNN on host numpy (ground truth for recall,
    mirroring bench.clj:72-84)."""
    data = np.asarray(data, np.float64)
    q = np.atleast_2d(np.asarray(queries, np.float64))
    if metric == "cosine":
        dn = data / np.maximum(np.linalg.norm(data, axis=1, keepdims=True), 1e-12)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        dist = 1.0 - qn @ dn.T
    elif metric == "euclidean":
        dist = np.sqrt(np.maximum(
            (q * q).sum(1)[:, None] + (data * data).sum(1)[None, :]
            - 2 * q @ data.T, 0))
    elif metric == "dot":
        dist = -(q @ data.T)
    else:
        raise ValueError(metric)
    idx = np.argsort(dist, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(dist, idx, axis=1), idx


def recall_at_k(approx_rows, exact_rows):
    """|approx ∩ exact| / k per query, averaged (bench.clj:86-92)."""
    rs = []
    for a, e in zip(approx_rows, exact_rows):
        a = set(int(x) for x in a if int(x) >= 0)
        e = set(int(x) for x in e)
        rs.append(len(a & e) / max(len(e), 1))
    return float(np.mean(rs))
