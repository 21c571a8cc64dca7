"""DBSCAN on top of the batched ε-neighborhood machinery.

The reference crate's primary consumer is petal-clustering's DBSCAN
(SURVEY.md: ball_tree.rs `query_radius` is "the DBSCAN driver").  This
example is the same driver pattern, TPU-shaped: neighbor counts and
ε-adjacency come from `query_radius_count_batch` / `query_radius_batch`
in large batches; only the union-find label propagation stays on the host.

Run:  python examples/dbscan.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOISE = -1


class _UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n)

    def find(self, a: int) -> int:
        while self.parent[a] != a:
            self.parent[a] = self.parent[self.parent[a]]
            a = self.parent[a]
        return a

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def dbscan(points, eps: float, min_samples: int, *, batch: int = 4096,
           cap: int = 1024):
    """Exact DBSCAN labels (NOISE = -1).

    Neighborhood semantics are the BallTree radius rules (the reference's
    exact behavior, ball_tree.rs:271-277): a point at exactly distance eps
    is included only when its whole leaf ball lies within eps (inclusive
    subtree take); leaf-scanned points use the strict d < eps filter.
    Core point = |N_eps(p)| >= min_samples (self included); clusters are
    connected components of core points within eps; border points join
    an arbitrary adjacent core cluster.
    """
    from petal_neighbors_tpu import BallTree

    points = np.asarray(points)
    n = points.shape[0]
    tree = BallTree.euclidean(points)

    # pass 1: core mask from neighbor counts (device-side, batched)
    counts = np.empty(n, dtype=np.int64)
    for s in range(0, n, batch):
        counts[s:s + batch] = np.asarray(
            tree.query_radius_count_batch(points[s:s + batch], eps))
    core = counts >= min_samples

    # pass 2: adjacency of core points -> union-find; border attachment
    uf = _UnionFind(n)
    border_owner = np.full(n, -1, dtype=np.int64)
    for s in range(0, n, batch):
        idx_pad, cnts = tree.query_radius_batch(points[s:s + batch], eps,
                                                cap=cap)
        idx_pad = np.asarray(idx_pad)
        cnts = np.asarray(cnts)
        if (cnts > cap).any():
            raise ValueError(
                f"neighbor cap {cap} exceeded (max {int(cnts.max())}); "
                "raise `cap`")
        for row in range(idx_pad.shape[0]):
            p = s + row
            if not core[p]:
                continue
            nbrs = idx_pad[row, :cnts[row]]
            for q in nbrs:
                if core[q]:
                    uf.union(p, int(q))
                elif border_owner[q] < 0:
                    border_owner[q] = p

    labels = np.full(n, NOISE, dtype=np.int64)
    roots = {}
    for p in range(n):
        anchor = p if core[p] else (int(border_owner[p])
                                    if border_owner[p] >= 0 else -1)
        if anchor < 0:
            continue
        r = uf.find(anchor)
        if r not in roots:
            roots[r] = len(roots)
        labels[p] = roots[r]
    return labels


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    blobs = np.concatenate([
        rng.normal([0, 0], 0.3, (2000, 2)),
        rng.normal([5, 5], 0.4, (2000, 2)),
        rng.normal([0, 6], 0.2, (1500, 2)),
        rng.uniform(-3, 9, (200, 2)),           # background noise
    ]).astype(np.float32)
    labels = dbscan(blobs, eps=0.3, min_samples=10, cap=2048)
    uniq, cnt = np.unique(labels, return_counts=True)
    print("clusters:", {int(u): int(c) for u, c in zip(uniq, cnt)})
