"""Layer-0 connectivity repair for batch-built HNSW graphs.

The exact-kNN batch builder (build.py) gives every node its true nearest
neighbors — which, on clustered corpora, all live in the same cluster. The
result is a high-quality graph per cluster and NO edges between clusters:
measured on a 64-cluster 31k corpus, only 964 of 31,173 rows were
BFS-reachable from the entry point, capping recall at ~0.97 no matter how
large ef grows. The reference never hits this because its sequential insert
(ultra_fast.clj:216-275) wires early inserts across the whole corpus before
clusters densify; a batch builder must repair connectivity explicitly.

Recipe (all O(N) device work + tiny host rounds):
1. `connected_labels`: min-label propagation over the undirected edge set on
   device until fixpoint — every node learns its component's smallest row id.
2. `bridge_components`: Boruvka rounds over component representatives. Each
   round scores all reps against all reps in one MXU GEMM, finds each
   component's nearest foreign rep pair, adds a MUTUAL bridge edge between
   those two nodes, and merges components with host union-find. Components
   at least halve per round, so <= log2(#components) GEMMs total.

Bridges go into a free adjacency slot when one exists, else replace the last
(worst, since slots are ascending by distance) slot.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hnsw_tpu.ops.distance import BIG, distances_from_dots
from hnsw_tpu.types import Metric

# cap on the total representative count per Boruvka round: bounds the
# [R, R] GEMM and the host transfer
MAX_REPS = 4096


@jax.jit
def connected_labels(adj: jnp.ndarray) -> jnp.ndarray:
    """Connected-component labels over the UNDIRECTED closure of adj
    [N_pad, M] (-1 padded). Returns int32 [N_pad]; rows without edges keep
    their own index. Pure device fixpoint: per step each node takes the min
    of its own label, its out-neighbors' labels (gather), and pushes its
    label to its out-neighbors (scatter-min)."""
    n_pad = adj.shape[0]
    init = jnp.arange(n_pad, dtype=jnp.int32)
    tgt = jnp.where(adj >= 0, adj, n_pad).reshape(-1)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        labels, _ = state
        nbr = jnp.where(adj >= 0, jnp.take(labels, jnp.maximum(adj, 0)),
                        n_pad)
        new = jnp.minimum(labels, jnp.min(nbr, axis=1))
        src = jnp.broadcast_to(new[:, None], adj.shape).reshape(-1)
        padded = jnp.concatenate(
            [new, jnp.full((1,), n_pad, jnp.int32)])
        padded = padded.at[tgt].min(src)
        new = padded[:n_pad]
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return labels


@partial(jax.jit, static_argnames=("metric",))
def _nearest_cross_rep(rep_vecs, rep_sq, comp_ids, metric: Metric):
    """For each representative, the distance/index of its nearest rep from a
    DIFFERENT component. rep_vecs [R, D]; comp_ids [R], -1 = padding."""
    dots = jnp.dot(rep_vecs, rep_vecs.T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    d = distances_from_dots(dots, rep_sq[:, None], rep_sq, metric)
    same = comp_ids[:, None] == comp_ids[None, :]
    invalid = (comp_ids < 0)[:, None] | (comp_ids < 0)[None, :]
    d = jnp.where(same | invalid, BIG, d)
    j = jnp.argmin(d, axis=1)
    return jnp.take_along_axis(d, j[:, None], axis=1)[:, 0], j


class _UnionFind:
    def __init__(self, items):
        self.parent = {int(i): int(i) for i in items}

    def find(self, a):
        p = self.parent
        while p[a] != a:
            p[a] = p[p[a]]
            a = p[a]
        return a

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def _pow2_at_least(x: int, floor: int = 8) -> int:
    p = floor
    while p < x:
        p *= 2
    return p


def bridge_components(
    vectors: jnp.ndarray,      # [N_pad, D]
    v_sq: jnp.ndarray,         # [N_pad]
    adj: np.ndarray,           # [ns, cap] GLOBAL row ids, -1 padded (mutated copy returned)
    member_rows: np.ndarray,   # [ns] global row ids the adjacency indexes
    *,
    metric: Metric,
    seed: int = 42,
    reps_per_comp: int = 8,
) -> tuple[np.ndarray, int]:
    """Boruvka-bridge adj until one connected component remains.

    adj holds global row ids; connectivity is computed over the local
    (member) index space. Returns (new adj, number of bridge edges added).
    """
    ns, cap = adj.shape
    if ns <= 1:
        return adj, 0
    adj = adj.copy()
    member_rows = np.asarray(member_rows, np.int32)
    # global row id -> local position (members are unique), vectorized
    inv_map = np.full(int(member_rows.max()) + 1, -1, np.int32)
    inv_map[member_rows] = np.arange(ns, dtype=np.int32)
    local = np.where(adj >= 0, inv_map[np.maximum(adj, 0)], -1).astype(np.int32)

    lp = _pow2_at_least(ns)
    adj_pad = np.full((lp, cap), -1, np.int32)
    adj_pad[:ns] = local
    labels = np.asarray(connected_labels(jnp.asarray(adj_pad)))[:ns]
    # union-find over UNIQUE labels only; per-node roots come from the
    # label->root table (keeps host work O(#components), not O(N), per round)
    uniq_labels, label_inv = np.unique(labels, return_inverse=True)
    uf = _UnionFind(uniq_labels)
    rng = np.random.default_rng(seed)
    n_bridges = 0
    # bridge slots are load-bearing: a later bridge overwriting an earlier
    # one silently un-merges components the union-find believes are joined.
    # Track how many tail slots each row has devoted to bridges so every
    # new bridge takes the next-worst slot instead.
    bridge_slots = np.zeros(ns, np.int32)

    for _ in range(64):  # components at least halve per round
        uroots = np.array([uf.find(int(l)) for l in uniq_labels], np.int32)
        roots = uroots[label_inv]
        uniq = np.unique(uroots)
        if len(uniq) <= 1:
            break
        rpc = max(1, min(reps_per_comp, MAX_REPS // len(uniq)))
        rep_locals, rep_comps = [], []
        for c in uniq:
            members = np.nonzero(roots == c)[0]
            take = members if len(members) <= rpc else \
                rng.choice(members, rpc, replace=False)
            rep_locals.extend(int(x) for x in take)
            rep_comps.extend([int(c)] * len(take))
        r = len(rep_locals)
        rp = _pow2_at_least(r)
        rep_loc = np.full(rp, 0, np.int32)
        rep_loc[:r] = rep_locals
        comp = np.full(rp, -1, np.int32)
        comp[:r] = rep_comps
        rows = jnp.asarray(member_rows[rep_loc])
        d, j = _nearest_cross_rep(
            jnp.take(vectors, rows, axis=0),
            jnp.take(v_sq, rows, axis=0),
            jnp.asarray(comp), metric)
        d = np.asarray(d)[:r]
        j = np.asarray(j)[:r]

        # per component: its best (rep, foreign rep) pair
        best: dict[int, tuple[float, int, int]] = {}
        for i in range(r):
            c = rep_comps[i]
            if d[i] < BIG and (c not in best or d[i] < best[c][0]):
                best[c] = (float(d[i]), rep_locals[i], int(rep_loc[j[i]]))
        if not best:
            break
        for c, (_, a, b) in best.items():
            ra, rb = uf.find(int(roots[a])), uf.find(int(roots[b]))
            if ra == rb:
                continue
            _add_edge(adj, local, bridge_slots, a, b, member_rows)
            _add_edge(adj, local, bridge_slots, b, a, member_rows)
            uf.union(ra, rb)
            n_bridges += 1
    return adj, n_bridges


def _add_edge(adj: np.ndarray, local: np.ndarray, bridge_slots: np.ndarray,
              a: int, b: int, member_rows: np.ndarray) -> None:
    """Append local edge a->b (global id member_rows[b]); free slot if any,
    else evict the worst non-bridge slot (slots are ascending by distance;
    earlier bridges at the tail are never overwritten)."""
    if (local[a] == b).any():
        return
    cap = adj.shape[1]
    free = np.nonzero(adj[a] < 0)[0]
    if len(free):
        slot = int(free[0])
        # a bridge landing in a tail slot must be protected from later
        # evictions too
        bridge_slots[a] = max(int(bridge_slots[a]), cap - slot) \
            if slot >= cap - 1 - int(bridge_slots[a]) else bridge_slots[a]
    else:
        slot = cap - 1 - int(bridge_slots[a])
        if slot < 0:       # row is all bridges already (cap tiny): reuse last
            slot = cap - 1
        else:
            bridge_slots[a] += 1
    adj[a, slot] = member_rows[b]
    local[a, slot] = b
