"""End-to-end DBSCAN driver test (the reference's downstream use case)."""

import numpy as np

from examples.dbscan import NOISE, dbscan


def naive_dbscan(points, eps, min_samples):
    """Textbook O(n^2) oracle."""
    n = len(points)
    d = np.sqrt(((points[:, None] - points[None]) ** 2).sum(-1))
    adj = d <= eps
    core = adj.sum(1) >= min_samples
    labels = np.full(n, NOISE)
    cid = 0
    for s in range(n):
        if labels[s] != NOISE or not core[s]:
            continue
        stack = [s]
        labels[s] = cid
        while stack:
            p = stack.pop()
            if not core[p]:
                continue
            for q in np.flatnonzero(adj[p]):
                if labels[q] == NOISE:
                    labels[q] = cid
                    stack.append(q)
        cid += 1
    return labels


def _same_partition(a, b):
    """Cluster labels equal up to renaming; noise must match exactly."""
    assert ((a == NOISE) == (b == NOISE)).all()
    mapping = {}
    for x, y in zip(a, b):
        if x == NOISE:
            continue
        if x in mapping:
            if mapping[x] != y:
                return False
        else:
            mapping[x] = y
    return len(set(mapping.values())) == len(mapping)


def test_dbscan_matches_naive(rng):
    pts = np.concatenate([
        rng.normal([0, 0], 0.2, (60, 2)),
        rng.normal([4, 4], 0.2, (50, 2)),
        rng.uniform(-2, 6, (15, 2)),
    ])
    ours = dbscan(pts, eps=0.5, min_samples=5, batch=32, cap=128)
    ref = naive_dbscan(pts, eps=0.5, min_samples=5)
    # border points adjacent to two clusters may legitimately attach to
    # either; this fixture is separated enough that partitions must match
    assert _same_partition(ours, ref)


def test_all_noise(rng):
    pts = rng.uniform(0, 100, (40, 2))  # sparse: nothing is core
    labels = dbscan(pts, eps=0.5, min_samples=5)
    assert (labels == NOISE).all()
