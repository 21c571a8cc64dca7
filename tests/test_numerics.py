"""Numerical-exactness regressions (code-review findings).

The matmul distance form loses absolute accuracy ~eps*(|q|^2+|x|^2) to
cancellation.  Un-centered data (an ordinary feature matrix with mean far
from the origin) used to silently destroy results: measured recall@10 of
0.02 before centering/direct-form fixes.  These tests pin the fixes.
"""

import numpy as np
import pytest

from petal_neighbors_tpu import BallTree, BruteForce
from petal_neighbors_tpu.ops import bruteforce as bf


@pytest.fixture
def uncentered(rng):
    """Tight cluster far from the origin: worst case for cancellation."""
    n, d = 2000, 128
    pts = (0.01 * rng.standard_normal((n, d)) + 100.0).astype(np.float32)
    qs = (0.01 * rng.standard_normal((32, d)) + 100.0).astype(np.float32)
    return pts, qs


def exact_oracle(pts, qs, k):
    p64, q64 = pts.astype(np.float64), qs.astype(np.float64)
    d = ((q64[:, None] - p64[None]) ** 2).sum(-1)
    return np.argsort(d, axis=1, kind="stable")[:, :k]


class TestUncenteredKnn:
    def test_ops_knn_recall(self, uncentered):
        pts, qs = uncentered
        _, i = bf.knn(pts, qs, 10)
        oi = exact_oracle(pts, qs, 10)
        hits = sum(len(set(np.asarray(i)[r].tolist()) & set(oi[r].tolist()))
                   for r in range(len(qs)))
        assert hits / (len(qs) * 10) == 1.0

    def test_bruteforce_index_recall(self, uncentered):
        pts, qs = uncentered
        idx = BruteForce.euclidean(pts)
        _, i = idx.query_batch(qs, 10)
        oi = exact_oracle(pts, qs, 10)
        hits = sum(len(set(np.asarray(i)[r].tolist()) & set(oi[r].tolist()))
                   for r in range(len(qs)))
        assert hits / (len(qs) * 10) == 1.0

    def test_balltree_recall(self, uncentered):
        pts, qs = uncentered
        tree = BallTree.euclidean(pts, leaf_size=64)
        _, i = tree.query_batch(qs, 10)
        oi = exact_oracle(pts, qs, 10)
        hits = sum(len(set(np.asarray(i)[r].tolist()) & set(oi[r].tolist()))
                   for r in range(len(qs)))
        assert hits / (len(qs) * 10) == 1.0

    def test_distances_match_exact(self, uncentered):
        pts, qs = uncentered
        d, i = bf.knn(pts, qs, 5)
        p64, q64 = pts.astype(np.float64), qs.astype(np.float64)
        for r in range(8):
            dr = np.sqrt(((p64 - q64[r]) ** 2).sum(1))
            np.testing.assert_allclose(
                np.asarray(d[r]), np.sort(dr)[:5], rtol=2e-4)


class TestUncenteredRadius:
    def test_tree_matches_bruteforce_mask(self, uncentered):
        pts, qs = uncentered
        # radius that captures ~a few dozen neighbors
        p64, q64 = pts.astype(np.float64), qs.astype(np.float64)
        d0 = np.sqrt(((p64 - q64[0]) ** 2).sum(1))
        r = float(np.sort(d0)[40])
        tree = BallTree.euclidean(pts, leaf_size=64)
        tm = np.asarray(tree.query_radius_batch(qs, r))
        exact = np.sqrt(((q64[:, None] - p64[None]) ** 2).sum(-1))
        # off-boundary points must be classified exactly
        clear = np.abs(exact - r) > 1e-4 * r
        strict = exact < r
        assert (tm[clear] == strict[clear]).all()

    def test_bruteforce_mask_exact(self, uncentered):
        pts, qs = uncentered
        p64, q64 = pts.astype(np.float64), qs.astype(np.float64)
        exact = np.sqrt(((q64[:, None] - p64[None]) ** 2).sum(-1))
        r = float(np.quantile(exact[0], 0.05))
        m = np.asarray(bf.radius_mask(pts, qs, r))
        clear = np.abs(exact - r) > 1e-4 * r
        assert (m[clear] == (exact <= r)[clear]).all()


class TestRingPaddingIndices:
    def test_nan_points_no_out_of_range(self, rng):
        """Review repro: NaN rows + pad rows tie at +inf; no padding index
        may escape (previously returned index 5 for n=5)."""
        from petal_neighbors_tpu import parallel
        pts = rng.uniform(0, 1, (5, 8)).astype(np.float64)
        pts[2:5] = np.nan
        qs = rng.uniform(0, 1, (4, 8))
        mesh = parallel.default_mesh(4, ("q", "p"))
        d, i = parallel.knn_ring(pts, qs, 5, mesh=mesh)
        i = np.asarray(i)
        assert (i < 5).all()
        mesh1 = parallel.default_mesh(4, ("shards",))
        d2, i2 = parallel.knn_points_sharded(pts, qs, 5, mesh=mesh1)
        assert (np.asarray(i2) < 5).all()
