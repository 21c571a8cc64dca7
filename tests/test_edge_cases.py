"""Adversarial edge cases across all indexes: tiny n, duplicates,
degenerate geometry, dtype handling."""

import numpy as np
import pytest

from petal_neighbors_tpu import BallTree, BruteForce, VantagePointTree


INDEXES = [BallTree, VantagePointTree, BruteForce]


class TestTinyN:
    @pytest.mark.parametrize("cls", INDEXES)
    def test_n1(self, cls):
        idx = cls.euclidean(np.array([[2.0, 3.0]]))
        i, d = idx.query_nearest(np.array([0.0, 0.0]))
        assert i == 0
        assert d == pytest.approx(np.sqrt(13.0))

    @pytest.mark.parametrize("cls", INDEXES)
    def test_n2(self, cls):
        idx = cls.euclidean(np.array([[0.0], [10.0]]))
        i, _ = idx.query_nearest(np.array([3.0]))
        assert i == 0
        i, _ = idx.query_nearest(np.array([7.0]))
        assert i == 1

    def test_n1_radius(self):
        t = BallTree.euclidean(np.array([[5.0]]))
        assert t.query_radius(np.array([5.0]), 0.1).tolist() == [0]
        assert t.query_radius(np.array([50.0]), 0.1).size == 0

    def test_n1_k_gt_n(self):
        t = BallTree.euclidean(np.array([[1.0, 2.0]]))
        i, d = t.query(np.array([1.0, 2.0]), 5)
        assert len(i) == 1 and d[0] == pytest.approx(0.0, abs=1e-12)


class TestDuplicates:
    def test_all_identical_radius(self):
        pts = np.ones((16, 3))
        t = BallTree.euclidean(pts, leaf_size=4)
        got = sorted(t.query_radius(np.ones(3), 0.5).tolist())
        assert got == list(range(16))

    def test_many_duplicates_knn(self, rng):
        pts = rng.uniform(0, 1, (50, 2))
        pts[10:30] = pts[10]
        t = BallTree.euclidean(pts, leaf_size=8)
        idx, dist = t.query(pts[10], 25)
        # the 20 duplicates are the 20 nearest (distance 0)
        assert set(range(10, 30)) <= set(idx[:20].tolist()) | set(
            idx[np.isclose(dist, 0.0)].tolist())
        assert np.isclose(dist[:20], 0.0).all()

    def test_vp_duplicates(self, rng):
        pts = np.ones((9, 2))
        vp = VantagePointTree.euclidean(pts)
        i, d = vp.query_nearest(np.ones(2))
        assert d == pytest.approx(0.0, abs=1e-12)


class TestDegenerateGeometry:
    def test_collinear(self, rng):
        pts = np.stack([np.arange(64.0), np.zeros(64)], 1)
        t = BallTree.euclidean(pts, leaf_size=4)
        i, d = t.query_nearest(np.array([31.4, 0.0]))
        assert i == 31
        got = sorted(t.query_radius(np.array([10.0, 0.0]), 2.5).tolist())
        assert got == [8, 9, 10, 11, 12]

    def test_single_unique_dim(self, rng):
        # spread exists only in column 1; split must pick it every level
        pts = np.stack([np.full(32, 7.0), rng.uniform(0, 1, 32)], 1)
        t = BallTree.euclidean(pts, leaf_size=None)
        q = np.array([7.0, 0.5])
        _, dist = t.query(q, 3)
        od = np.sort(np.abs(pts[:, 1] - 0.5))[:3]
        np.testing.assert_allclose(dist, od, rtol=1e-12)

    def test_leaf_size_bigger_than_n(self, rng):
        pts = rng.uniform(0, 1, (10, 3))
        t = BallTree.euclidean(pts, leaf_size=128)
        assert t.num_nodes() == 1          # single root leaf
        _, dist = t.query(pts[0], 3)
        assert dist[0] == pytest.approx(0.0, abs=1e-12)


class TestDtypes:
    def test_f32_inputs(self, rng):
        pts = rng.uniform(0, 1, (40, 3)).astype(np.float32)
        t = BallTree.euclidean(pts)
        _, d = t.query(pts[0].astype(np.float32), 2)
        assert d.dtype == np.float32
        assert d[0] == pytest.approx(0.0, abs=1e-6)

    def test_int_inputs_promoted(self):
        pts = np.array([[0, 0], [3, 4]], dtype=np.int64)
        t = BallTree.euclidean(pts)
        i, d = t.query_nearest(np.array([0.0, 1.0]))
        assert i == 0 and d == pytest.approx(1.0)
