"""HDBSCAN-core example: oracle checks for core distances, mutual
reachability, and the MST backbone."""

import numpy as np

from examples.hdbscan_core import core_distances, mst_edges, mutual_reachability


def test_core_distances_oracle(rng):
    pts = rng.uniform(0, 1, (50, 3))
    k = 4
    got = core_distances(pts, k)
    d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    want = np.sort(d, axis=1)[:, k - 1]   # self included -> column k-1
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_mutual_reachability_properties(rng):
    pts = rng.uniform(0, 1, (30, 2))
    m = mutual_reachability(pts, 3)
    assert m.shape == (30, 30)
    np.testing.assert_array_equal(np.diag(m), 0.0)
    np.testing.assert_allclose(m, m.T, atol=1e-7)
    core = core_distances(pts, 3)
    d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    off = ~np.eye(30, dtype=bool)
    assert (m[off] >= d[off] - 1e-7).all()
    assert (m[off] >= np.maximum(core[:, None], core[None, :])[off] - 1e-7).all()


def test_mst_separates_clusters(rng):
    pts = np.concatenate([
        rng.normal([0, 0], 0.1, (40, 2)),
        rng.normal([10, 10], 0.1, (40, 2)),
    ])
    edges = mst_edges(pts, k=3)
    assert len(edges) == 79
    weights = sorted(e[2] for e in edges)
    # exactly one bridge edge between the two far clusters
    assert weights[-1] > 10 and weights[-2] < 1
