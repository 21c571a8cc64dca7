"""Dual-tree k-NN join vs the O(n^2) host oracle.

Reference contract being exercised: the node-pair pruning bound
max(d(c1,c2) - r1 - r2, 0) (ball_tree.rs:303-317) applied leaf-pair-wise
must lose no true neighbor — recall 1.0 against dense distances.
"""

import numpy as np
import pytest

from petal_neighbors_tpu import BallTree, dual_tree_knn
from petal_neighbors_tpu.distance import Cosine, Euclidean, Manhattan


@pytest.fixture
def rng():
    return np.random.default_rng(0xD0A1)


def _oracle(a, b, k):
    d = np.sqrt(((a[:, None, :].astype(np.float64)
                  - b[None, :, :].astype(np.float64)) ** 2).sum(-1))
    return np.sort(d, axis=1)[:, :k]


class TestDualJoin:
    @pytest.mark.parametrize("na,nb", [(40, 60), (300, 257), (1000, 1000)])
    def test_cross_join_matches_oracle(self, rng, na, nb):
        a = rng.normal(size=(na, 3))
        b = rng.normal(size=(nb, 3))
        ta, tb = BallTree.euclidean(a), BallTree.euclidean(b)
        d, i = dual_tree_knn(ta, tb, 5)
        d, i = np.asarray(d), np.asarray(i)
        od = _oracle(a, b, 5)
        np.testing.assert_allclose(d, od, rtol=1e-9, atol=1e-12)
        # ids must actually realize the distances
        real = np.sqrt(((a[:, None] - b[i]) ** 2).sum(-1))
        np.testing.assert_allclose(real, d, rtol=1e-9, atol=1e-12)

    def test_self_join_includes_self(self, rng):
        pts = rng.normal(size=(500, 2))
        t = BallTree.euclidean(pts)
        d, i = t.query_tree(t, 3)
        d, i = np.asarray(d), np.asarray(i)
        np.testing.assert_array_equal(i[:, 0], np.arange(500))
        np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-12)
        od = _oracle(pts, pts, 3)
        np.testing.assert_allclose(d, od, rtol=1e-9, atol=1e-12)

    def test_small_leaves_reference_sizing(self, rng):
        """leaf_size=None (1-2 points/leaf, reference sizing) still exact."""
        a = rng.normal(size=(37, 2))
        b = rng.normal(size=(23, 2))
        ta = BallTree(a, Euclidean(), leaf_size=None)
        tb = BallTree(b, Euclidean(), leaf_size=None)
        d, i = dual_tree_knn(ta, tb, 4)
        np.testing.assert_allclose(np.asarray(d), _oracle(a, b, 4),
                                   rtol=1e-9, atol=1e-12)

    def test_k_edges(self, rng):
        a = rng.normal(size=(20, 2))
        b = rng.normal(size=(7, 2))
        ta, tb = BallTree.euclidean(a), BallTree.euclidean(b)
        d0, i0 = dual_tree_knn(ta, tb, 0)
        assert d0.shape == (20, 0) and i0.shape == (20, 0)
        d, i = dual_tree_knn(ta, tb, 50)          # k > nB -> nB results
        assert d.shape == (20, 7)
        np.testing.assert_allclose(np.asarray(d), _oracle(a, b, 7),
                                   rtol=1e-9, atol=1e-12)

    def test_nan_points_sort_farthest(self, rng):
        a = rng.normal(size=(64, 3))
        b = rng.normal(size=(128, 3))
        b[5] = np.nan
        b[17, 0] = np.nan
        ta, tb = BallTree.euclidean(a), BallTree.euclidean(b)
        d, i = dual_tree_knn(ta, tb, 4)
        i = np.asarray(i)
        assert not np.isin(i, [5, 17]).any()
        finite = ~np.isnan(b).any(1)
        od = _oracle(a, b[finite], 4)
        np.testing.assert_allclose(np.asarray(d), od, rtol=1e-6, atol=1e-9)

    def test_generic_metric(self, rng):
        a = rng.normal(size=(100, 4))
        b = rng.normal(size=(90, 4))
        ta = BallTree(a, Manhattan())
        tb = BallTree(b, Manhattan())
        d, i = dual_tree_knn(ta, tb, 3)
        od = np.sort(np.abs(a[:, None].astype(np.float64)
                            - b[None, :].astype(np.float64)).sum(-1), 1)[:, :3]
        np.testing.assert_allclose(np.asarray(d), od, rtol=1e-6)

    def test_metric_mismatch_rejected(self, rng):
        a = rng.normal(size=(10, 2))
        with pytest.raises(ValueError, match="metric"):
            dual_tree_knn(BallTree(a, Euclidean()), BallTree(a, Cosine()), 2)
        with pytest.raises(ValueError, match="dimension"):
            dual_tree_knn(BallTree.euclidean(a),
                          BallTree.euclidean(rng.normal(size=(10, 3))), 2)

    def test_high_dim_centered_bounds(self, rng):
        """dim > 32: centroid bounds go through the centered matmul form;
        member distances stay direct — exact on large-mean data."""
        a = (rng.normal(size=(200, 48)) + 100.0)
        b = (rng.normal(size=(150, 48)) + 100.0)
        ta, tb = BallTree.euclidean(a), BallTree.euclidean(b)
        d, i = dual_tree_knn(ta, tb, 5)
        np.testing.assert_allclose(np.asarray(d), _oracle(a, b, 5),
                                   rtol=1e-5, atol=1e-4)


class TestJoinViaTree:
    """Round-5 low-dim join engine: tree_b's tile-shared single-tree
    k-NN driven with tree_a's points (the per-member-tau replacement for
    the leaf-pair sweep's group tau, VERDICT r4 item 6)."""

    def test_matches_oracle_and_sweep(self, rng):
        from petal_neighbors_tpu.trees.dual import _join_via_tree
        a = rng.normal(size=(700, 2)).astype(np.float32)
        b = rng.normal(size=(900, 2)).astype(np.float32)
        ta, tb = BallTree.euclidean(a), BallTree.euclidean(b)
        d, i = _join_via_tree(ta, tb, 5)
        d, i = np.asarray(d), np.asarray(i)
        od = _oracle(a, b, 5)
        np.testing.assert_allclose(d, od, rtol=1e-5, atol=1e-6)
        real = np.sqrt(((a[:, None] - b[i]) ** 2).sum(-1))
        np.testing.assert_allclose(real, d, rtol=1e-5, atol=1e-6)

    def test_blocked_launches_concat(self, rng):
        from petal_neighbors_tpu.trees.dual import _join_via_tree
        a = rng.normal(size=(515, 3)).astype(np.float32)
        b = rng.normal(size=(400, 3)).astype(np.float32)
        ta, tb = BallTree.euclidean(a), BallTree.euclidean(b)
        d, i = _join_via_tree(ta, tb, 4, qblock=128)
        od = _oracle(a, b, 4)
        np.testing.assert_allclose(np.asarray(d), od, rtol=1e-5, atol=1e-6)

    def test_self_join_includes_self(self, rng):
        from petal_neighbors_tpu.trees.dual import _join_via_tree
        pts = rng.normal(size=(600, 2)).astype(np.float32)
        t = BallTree.euclidean(pts)
        d, i = _join_via_tree(t, t, 3)
        d, i = np.asarray(d), np.asarray(i)
        np.testing.assert_array_equal(i[:, 0], np.arange(600))
        np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-6)
