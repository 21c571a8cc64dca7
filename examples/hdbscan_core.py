"""HDBSCAN computational core on top of the batched k-NN machinery.

The reference exposes its dual-tree node accessors *for* petal-clustering's
HDBSCAN (SURVEY.md: CHANGELOG.md:70, ball_tree.rs:303-353).  This example
provides the same consumer's heavy kernels, TPU-shaped:

* ``core_distances`` — distance to the k-th neighbor of every point
  (one batched lockstep tree query);
* ``mutual_reachability`` — max(core_i, core_j, d(i, j)) pairwise matrix
  (one MXU pairwise pass + elementwise maxima);
* ``mst_edges`` — Prim's minimum spanning tree over mutual reachability
  (the single-linkage backbone of HDBSCAN), host-side O(n^2) over the
  device-computed matrix.

Run:  python examples/hdbscan_core.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def core_distances(points, k: int, *, batch: int = 8192) -> np.ndarray:
    """d(p, k-th neighbor of p), self included (HDBSCAN's core distance)."""
    from petal_neighbors_tpu import BallTree

    points = np.asarray(points)
    tree = BallTree.euclidean(points)
    out = np.empty(len(points), dtype=np.float64)
    for s in range(0, len(points), batch):
        d, _ = tree.query_batch(points[s:s + batch], k)
        out[s:s + batch] = np.asarray(d)[:, -1]
    return out


def mutual_reachability(points, k: int) -> np.ndarray:
    """(n, n) mutual-reachability matrix:
    max(core_i, core_j, d(i, j)).  O(n^2) memory — for the MST stage on
    moderate n; larger n should chunk rows into Prim's directly."""
    from petal_neighbors_tpu import pairwise

    core = core_distances(points, k)
    d = np.asarray(pairwise(np.asarray(points)))
    m = np.maximum(d, core[:, None])
    m = np.maximum(m, core[None, :])
    np.fill_diagonal(m, 0.0)
    return m


def mst_edges(points, k: int):
    """Prim's MST over mutual reachability: the HDBSCAN single-linkage
    backbone.  Returns (u, v, weight) edges, n-1 of them."""
    m = mutual_reachability(points, k)
    n = len(m)
    in_tree = np.zeros(n, dtype=bool)
    best = np.full(n, np.inf)
    best_from = np.zeros(n, dtype=np.int64)
    in_tree[0] = True
    best = m[0].copy()
    best_from[:] = 0
    edges = []
    for _ in range(n - 1):
        cand = np.where(in_tree, np.inf, best)
        j = int(np.argmin(cand))
        edges.append((int(best_from[j]), j, float(best[j])))
        in_tree[j] = True
        closer = m[j] < best
        best = np.where(closer, m[j], best)
        best_from = np.where(closer, j, best_from)
    return edges


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
