"""HDBSCAN computational core on top of the dual-tree join.

The reference exposes its dual-tree node accessors *for* petal-clustering's
HDBSCAN (SURVEY.md: CHANGELOG.md:70, ball_tree.rs:303-353).  This example
provides the same consumer's heavy kernels, TPU-shaped and END-TO-END on
device:

* ``core_distances`` — distance to the k-th neighbor of every point: ONE
  dual-tree self-join program (``BallTree.query_tree``, the batched form
  of the node-pair traversal the accessors enable);
* ``mutual_reachability`` — max(core_i, core_j, d(i, j)) pairwise matrix
  (one MXU pairwise pass + elementwise maxima, one jitted program);
* ``mst_edges`` — Prim's minimum spanning tree over mutual reachability
  (the single-linkage backbone of HDBSCAN), a single jitted
  ``fori_loop`` on device (n-1 argmin/relax steps over (n,) vectors).

The matrix stages are O(n^2) memory (<= ~30k points on one chip); the
SCALABLE path (round 3) is ``mst_edges_scalable`` — device-side Borůvka
rounds (``trees.boruvka``: dense masked-scan rounds from dim 4 up,
dual-leaf-sweep rounds at low dim), no dense matrix, 1M+ points — plus
``single_linkage`` turning the MST into the scipy-format dendrogram
HDBSCAN condenses.

Run:  python examples/hdbscan_core.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def core_distances(points, k: int) -> np.ndarray:
    """d(p, k-th neighbor of p), self included (HDBSCAN's core distance).
    One device program: the dual-tree all-k-NN self-join."""
    from petal_neighbors_tpu import BallTree

    tree = BallTree.euclidean(np.asarray(points))
    d, _ = tree.query_tree(tree, k)
    return np.asarray(d)[:, -1].astype(np.float64)


def _mutual_reachability_device(points, core):
    import jax.numpy as jnp
    from petal_neighbors_tpu import pairwise

    d = pairwise(jnp.asarray(points))
    m = jnp.maximum(d, jnp.maximum(core[:, None], core[None, :]))
    n = d.shape[0]
    return jnp.where(jnp.eye(n, dtype=bool), 0.0, m)


def mutual_reachability(points, k: int) -> np.ndarray:
    """(n, n) mutual-reachability matrix: max(core_i, core_j, d(i, j))."""
    import jax.numpy as jnp

    points = np.asarray(points)
    core = core_distances(points, k).astype(points.dtype)
    return np.asarray(
        _mutual_reachability_device(points, jnp.asarray(core)))


def _mst_prim_device(m):
    """Prim's MST on device: one jitted fori_loop, n-1 argmin/relax steps
    over (n,) vectors.  Returns (us, vs, ws) edge arrays."""
    import jax
    import jax.numpy as jnp

    n = m.shape[0]

    def step(t, state):
        best, best_from, in_tree, us, vs, ws = state
        cand = jnp.where(in_tree, jnp.inf, best)
        j = jnp.argmin(cand).astype(jnp.int32)
        us = us.at[t].set(best_from[j])
        vs = vs.at[t].set(j)
        ws = ws.at[t].set(best[j])
        in_tree = in_tree.at[j].set(True)
        row = m[j]
        closer = row < best
        best = jnp.where(closer, row, best)
        best_from = jnp.where(closer, j, best_from)
        return best, best_from, in_tree, us, vs, ws

    init = (m[0],
            jnp.zeros(n, dtype=jnp.int32),
            jnp.zeros(n, dtype=bool).at[0].set(True),
            jnp.zeros(n - 1, dtype=jnp.int32),
            jnp.zeros(n - 1, dtype=jnp.int32),
            jnp.zeros(n - 1, dtype=m.dtype))
    _, _, _, us, vs, ws = jax.lax.fori_loop(0, n - 1, step, init)
    return us, vs, ws


def mst_edges(points, k: int):
    """Prim's MST over mutual reachability: the HDBSCAN single-linkage
    backbone.  Returns (u, v, weight) edges, n-1 of them.  Both the
    matrix and the MST run on device; only the final edge list lands on
    host."""
    import jax
    import jax.numpy as jnp

    points = np.asarray(points)
    core = core_distances(points, k).astype(points.dtype)
    m = _mutual_reachability_device(points, jnp.asarray(core))
    us, vs, ws = jax.jit(_mst_prim_device)(m)
    return [(int(u), int(v), float(w))
            for u, v, w in zip(np.asarray(us), np.asarray(vs),
                               np.asarray(ws))]


def mst_edges_scalable(points, k: int, *, leaf_size: int = 128):
    """Mutual-reachability MST without the dense matrix: ~log2(n)
    device-side Borůvka rounds (trees.boruvka) — the 1M+-point HDBSCAN
    backbone (241 s at 1M x 8-d on one v5e: streaming core-distance
    scan + dense masked-scan rounds; tree-sweep rounds at low dim).
    Returns (us, vs, ws) numpy arrays."""
    from petal_neighbors_tpu import mutual_reachability_mst

    return mutual_reachability_mst(np.asarray(points), k,
                                   leaf_size=leaf_size)


def single_linkage(us, vs, ws, n: int) -> np.ndarray:
    """Scipy-format linkage matrix from MST edges — now part of the
    package (``petal_neighbors_tpu.cluster``); kept here as the
    consumer-example entry point."""
    from petal_neighbors_tpu.cluster import single_linkage as _sl

    return _sl(us, vs, ws, n)


def hdbscan_labels(points, min_cluster_size: int = 5,
                   min_samples: int | None = None):
    """The consumer's actual product: HDBSCAN cluster labels (+ membership
    probabilities) at any scale — device MST backbone (Borůvka rounds, no
    dense matrix) + host condensed tree and excess-of-mass extraction
    (``petal_neighbors_tpu.cluster``)."""
    from petal_neighbors_tpu.cluster import hdbscan

    res = hdbscan(np.asarray(points), min_cluster_size,
                  min_samples=min_samples)
    return res.labels, res.probabilities


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.normal([0, 0], 0.3, (500, 2)),
        rng.normal([5, 5], 0.4, (500, 2)),
    ]).astype(np.float32)
    core = core_distances(pts, k=5)
    print("core distance quantiles:",
          np.round(np.quantile(core, [0.1, 0.5, 0.9]), 4))
    edges = mst_edges(pts, k=5)
    w = np.array([e[2] for e in edges])
    print(f"MST: {len(edges)} edges, max weight {w.max():.4f} "
          f"(the cluster-separating edge)")
    labels, probs = hdbscan_labels(pts, min_cluster_size=10)
    uniq = [int(c) for c in np.unique(labels) if c >= 0]
    print(f"HDBSCAN: {len(uniq)} clusters, "
          f"{int((labels < 0).sum())} noise points, "
          f"sizes {[int((labels == c).sum()) for c in uniq]}")
