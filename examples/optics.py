"""OPTICS on top of the batched k-NN + ε-neighborhood machinery.

The reference crate's downstream consumer petal-clustering ships DBSCAN,
OPTICS and HDBSCAN over these indexes (SURVEY.md §0).  This example is
the OPTICS driver TPU-shaped, like examples/dbscan.py:

* core distances = one batched k-NN sweep on device (distance to the
  ``min_samples``-th neighbor, self included),
* ε-neighbor lists = batched capped radius queries on device,
* only the inherently sequential reachability walk (a priority queue
  popping one point at a time) stays on the host — the same split the
  reference ecosystem uses (single-threaded graph walk over index
  answers).

Output follows the classic contract: a processing ``ordering``, per-point
``reachability`` (inf for each component's seed), and ``core_dist``
(inf where the ε-neighborhood holds fewer than ``min_samples`` points).
Clusters are then extracted by thresholding reachability (DBSCAN-like)
or ξ-steepness — both pure host post-processing on the returned arrays.

Run:  python examples/optics.py
"""

from __future__ import annotations

import heapq
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def optics(points, eps: float, min_samples: int, *, batch: int = 4096,
           cap: int = 1024):
    """Exact OPTICS (ordering, reachability, core_dist).

    Determinism: seeds are the smallest-id unprocessed points and the
    priority queue breaks reachability ties by id — a fixed total order,
    so results are reproducible bit-for-bit given the index's distances.
    Neighborhood semantics are the BallTree radius rules (the
    reference's exact boundary behavior, ball_tree.rs:271-277): a
    neighbor at EXACTLY distance eps can be present or absent from the
    expansion lists depending on which tree path reached it, while the
    core test below is uniformly inclusive (k-th distance <= eps) —
    boundary-exact data can therefore deviate from the
    uniform-inclusive-neighborhood OPTICS formulation by that one pair
    (continuous data never hits the boundary exactly).
    """
    from petal_neighbors_tpu import BallTree

    points = np.asarray(points)
    n = points.shape[0]
    tree = BallTree.euclidean(points)

    # device pass 1: core distances from one batched k-NN sweep
    core_dist = np.empty(n, dtype=np.float64)
    for s in range(0, n, batch):
        d, _ = tree.query_batch(points[s:s + batch], min_samples)
        d = np.asarray(d)
        kth = (d[:, -1] if d.shape[1] == min_samples
               else np.full(len(d), np.inf))    # n < min_samples
        core_dist[s:s + batch] = kth
    core_dist[core_dist > eps] = np.inf         # undefined past eps

    # device pass 2: capped ε-neighbor lists
    nbr_ids = np.empty((n, 0), dtype=np.int64)
    nbr_list = []
    for s in range(0, n, batch):
        ids, cnts = tree.query_radius_batch(points[s:s + batch], eps,
                                            cap=cap)
        cnts = np.asarray(cnts)
        if (cnts > cap).any():
            raise ValueError(
                f"neighbor cap {cap} exceeded (max {int(cnts.max())}); "
                "raise `cap`")
        nbr_list.append(np.asarray(ids))
    nbr_ids = np.concatenate(nbr_list, axis=0)

    # host walk: classic OPTICS priority-queue expansion
    pts64 = points.astype(np.float64)
    reach = np.full(n, np.inf)
    processed = np.zeros(n, dtype=bool)
    ordering = []
    heap = []       # (reachability, id) — id breaks ties

    def update_from(p: int):
        if not np.isfinite(core_dist[p]):
            return
        nbrs = nbr_ids[p]
        nbrs = nbrs[nbrs >= 0]
        nbrs = nbrs[~processed[nbrs]]
        if nbrs.size == 0:
            return
        d = np.sqrt(((pts64[nbrs] - pts64[p]) ** 2).sum(1))
        newreach = np.maximum(core_dist[p], d)
        better = newreach < reach[nbrs]
        for o, r in zip(nbrs[better], newreach[better]):
            reach[o] = r
            heapq.heappush(heap, (r, int(o)))

    for seed in range(n):
        if processed[seed]:
            continue
        processed[seed] = True
        ordering.append(seed)
        update_from(seed)
        while heap:
            r, p = heapq.heappop(heap)
            if processed[p] or r > reach[p]:
                continue            # stale entry (lazy-deletion heap)
            processed[p] = True
            ordering.append(p)
            update_from(p)

    return np.asarray(ordering), reach, core_dist


def extract_dbscan(ordering, reach, core_dist, eps_prime: float):
    """DBSCAN-equivalent labels from an OPTICS result (threshold
    extraction): a new cluster starts where reachability exceeds
    ``eps_prime`` but the point itself is core at ``eps_prime``."""
    labels = np.full(len(ordering), -1, dtype=np.int64)
    cid = -1
    for p in ordering:
        if reach[p] > eps_prime:
            if core_dist[p] <= eps_prime:
                cid += 1
                labels[p] = cid
        else:
            labels[p] = cid
    return labels


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    blobs = np.concatenate([
        rng.normal([0, 0], 0.3, (2000, 2)),
        rng.normal([5, 5], 0.4, (2000, 2)),
        rng.normal([0, 6], 0.2, (1500, 2)),
        rng.uniform(-3, 9, (200, 2)),           # background noise
    ]).astype(np.float32)
    ordering, reach, core = optics(blobs, eps=1.0, min_samples=10,
                                   cap=4096)
    labels = extract_dbscan(ordering, reach, core, 0.3)
    uniq, cnt = np.unique(labels, return_counts=True)
    print("clusters:", {int(u): int(c) for u, c in zip(uniq, cnt)})
    finite = np.isfinite(reach)
    print(f"reachability: median {np.median(reach[finite]):.3f}, "
          f"{finite.sum()} reachable of {len(blobs)}")
