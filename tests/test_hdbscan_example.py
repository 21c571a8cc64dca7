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


def test_core_distances_uses_dual_join(rng):
    """core_distances is one dual-join program; cross-check vs dense."""
    pts = rng.normal(size=(700, 4))
    got = core_distances(pts, 6)
    d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    np.testing.assert_allclose(got, np.sort(d, 1)[:, 5], rtol=1e-6)


def test_mst_matches_host_oracle_end_to_end(rng):
    """Device MST (dual join -> MR matrix -> Prim fori_loop) == host
    O(n^2) Prim: same total weight and same edge-weight multiset
    (weights are distinct w.p. 1 on random data -> MST unique)."""
    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    k = 5
    edges = mst_edges(pts, k)
    assert len(edges) == 1999
    got_w = np.sort([e[2] for e in edges])

    # host oracle: dense f64 mutual reachability + Prim
    d = np.sqrt(((pts[:, None].astype(np.float64)
                  - pts[None].astype(np.float64)) ** 2).sum(-1))
    core = np.sort(d, 1)[:, k - 1]
    m = np.maximum(d, np.maximum(core[:, None], core[None, :]))
    np.fill_diagonal(m, 0.0)
    n = len(m)
    in_tree = np.zeros(n, bool); in_tree[0] = True
    best = m[0].copy(); want_w = []
    for _ in range(n - 1):
        j = int(np.argmin(np.where(in_tree, np.inf, best)))
        want_w.append(best[j]); in_tree[j] = True
        best = np.minimum(best, m[j])
    np.testing.assert_allclose(got_w, np.sort(want_w), rtol=1e-4)
