"""OPTICS example vs a naive O(n²) float64 oracle.

Both sides use the same deterministic tie rules (smallest-id seeds,
id-tiebroken priority queue), so ordering and reachability must match
exactly (tests run x64 on CPU, so device distances are f64 too).
"""

import heapq
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

from optics import extract_dbscan, optics  # noqa: E402


def naive_optics(points, eps, min_samples):
    p = np.asarray(points, dtype=np.float64)
    n = len(p)
    d = np.sqrt(((p[:, None] - p[None]) ** 2).sum(-1))
    core = np.sort(d, axis=1)[:, min_samples - 1].copy()
    core[core > eps] = np.inf
    nbrs = [np.flatnonzero(d[i] <= eps) for i in range(n)]
    # NB: the naive neighborhood uses uniform inclusive d <= eps; the
    # tree's boundary rules differ only at exact-boundary points, which
    # random float data does not produce.
    reach = np.full(n, np.inf)
    processed = np.zeros(n, dtype=bool)
    ordering = []
    heap = []

    def update(pp):
        if not np.isfinite(core[pp]):
            return
        for o in nbrs[pp]:
            if processed[o]:
                continue
            r = max(core[pp], d[pp, o])
            if r < reach[o]:
                reach[o] = r
                heapq.heappush(heap, (r, int(o)))

    for seed in range(n):
        if processed[seed]:
            continue
        processed[seed] = True
        ordering.append(seed)
        update(seed)
        while heap:
            r, q = heapq.heappop(heap)
            if processed[q] or r > reach[q]:
                continue
            processed[q] = True
            ordering.append(q)
            update(q)
    return np.asarray(ordering), reach, core


@pytest.mark.parametrize("min_samples", [3, 8])
def test_optics_matches_naive(rng, min_samples):
    # Integer lattice points: every squared distance is an exact f64
    # integer, so the device and host paths compute bit-identical
    # distances and the (deterministically tie-broken) walks must agree
    # exactly.  Continuous data can diverge by 1 ulp in a core distance,
    # flipping heap priorities into a DIFFERENT-but-valid OPTICS order.
    pts = np.concatenate([
        rng.integers(0, 12, (60, 2)),
        rng.integers(20, 34, (50, 2)),
        rng.integers(-20, 50, (15, 2)),
    ]).astype(np.float64)
    eps = 3.5          # eps² = 12.25: never equals an integer rd —
    o1, r1, c1 = optics(pts, eps, min_samples, cap=256)   # no boundary ties
    o2, r2, c2 = naive_optics(pts, eps, min_samples)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(r1, r2)


def test_extracted_clusters_are_sane(rng):
    pts = np.concatenate([
        rng.normal([0, 0], 0.2, (80, 2)),
        rng.normal([5, 5], 0.2, (80, 2)),
    ]).astype(np.float64)
    ordering, reach, core = optics(pts, 2.0, 5, cap=256)
    labels = extract_dbscan(ordering, reach, core, 0.5)
    # the two blobs end up in two different clusters
    a = np.unique(labels[:80])
    b = np.unique(labels[80:])
    a = a[a >= 0]
    b = b[b >= 0]
    assert len(a) == 1 and len(b) == 1 and a[0] != b[0]


def test_all_sparse_unreachable(rng):
    pts = (rng.uniform(0, 100, (40, 2))).astype(np.float64)
    ordering, reach, core = optics(pts, 0.01, 3, cap=64)
    assert np.isinf(core).all()
    assert np.isinf(reach).all()
    assert len(ordering) == 40          # every point still ordered
