"""HNSW graph structure: flat, fixed-degree int32 adjacency tables.

The reference stores the graph as a string-keyed ConcurrentHashMap of UltraNode
objects each holding an array of HashSets (ultra_fast.clj:99-111). Here the
whole hierarchy is four dense arrays — exactly the int-indexed dense layout the
reference's own design notes point to (wip/BITSET_OPTIMIZATION_REPORT.md:24-30)
and the only layout a TPU can traverse:

  levels    int32[N_pad]          per-node top level (-1 for padding rows)
  adj0      int32[N_pad, M0]      layer-0 neighbors, -1 = empty slot
  adj_upper int32[L, N_pad, M]    layers 1..L, -1 = empty slot
  entry     int32 scalar          entry point node id

Degree caps M0 = 2M at layer 0 and M above mirror graph.clj:214-216.
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp
import numpy as np

NONE = -1  # empty adjacency slot / no node


@dataclasses.dataclass
class HNSWGraph:
    levels: jnp.ndarray       # int32 [N_pad]
    adj0: jnp.ndarray         # int32 [N_pad, M0]
    adj_upper: jnp.ndarray    # int32 [L, N_pad, M]  (L may be 0)
    entry: int                # entry node id (host int; -1 if empty)
    max_level: int            # top layer index (0 = flat graph)
    m: int                    # M (upper-layer degree cap)
    m0: int                   # layer-0 degree cap (2M)
    ef_construction: int
    n: int                    # real node count
    n_bridges: int = 0        # connectivity-repair edges added (repair.py)

    @property
    def n_pad(self) -> int:
        return int(self.adj0.shape[0])

    def info(self) -> dict:
        """Graph stats — the analogue of graph-info (graph.clj:329-343)."""
        adj0 = np.asarray(self.adj0[: self.n])
        deg = (adj0 >= 0).sum(axis=1)
        levels = np.asarray(self.levels[: self.n])
        return {
            "element_count": self.n,
            "entry_point": int(self.entry),
            "max_level": int(self.max_level),
            "M": self.m,
            "M0": self.m0,
            "ef_construction": self.ef_construction,
            "avg_connections_l0": float(deg.mean()) if self.n else 0.0,
            "bridge_edges": int(self.n_bridges),
            "level_histogram": {int(l): int(c) for l, c in
                                zip(*np.unique(levels, return_counts=True))},
        }


def assign_levels(n: int, ml: float, seed: int, max_cap: int = 16) -> np.ndarray:
    """Seeded exponential level assignment: floor(ml * -ln u) — the
    reference's scheme (graph.clj:94-99, ultra_fast.clj:143-147)."""
    rng = np.random.default_rng(seed)
    u = rng.random(n)
    lv = np.floor(-np.log(np.maximum(u, 1e-12)) * ml).astype(np.int32)
    return np.minimum(lv, max_cap)


def empty_graph(n_pad: int, m: int, m0: int, max_level: int,
                ef_construction: int) -> HNSWGraph:
    lu = max(max_level, 0)
    return HNSWGraph(
        levels=jnp.full((n_pad,), NONE, jnp.int32),
        adj0=jnp.full((n_pad, m0), NONE, jnp.int32),
        adj_upper=jnp.full((lu, n_pad, m), NONE, jnp.int32),
        entry=NONE,
        max_level=0,
        m=m, m0=m0,
        ef_construction=ef_construction,
        n=0,
    )
