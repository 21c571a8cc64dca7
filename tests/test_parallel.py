"""Multi-device tests on the 8-device virtual CPU mesh (conftest forces
--xla_force_host_platform_device_count=8 — the JAX fake-backend idiom that
stands in for a TPU pod, SURVEY.md §4)."""

import numpy as np
import jax
import pytest

from petal_neighbors_tpu import parallel
from petal_neighbors_tpu.ops import bruteforce as bf


@pytest.fixture(scope="module")
def mesh1d():
    return parallel.default_mesh(8, ("shards",))


@pytest.fixture(scope="module")
def mesh2d():
    return parallel.default_mesh(8, ("q", "p"))


def oracle(points, queries, k):
    d, i = bf.knn(points, queries, k)
    return np.asarray(d), np.asarray(i)


class TestDeviceSetup:
    def test_eight_devices(self):
        assert len(jax.devices()) == 8


class TestQuerySharded:
    def test_matches_single_device(self, rng, mesh1d):
        pts = rng.uniform(0, 1, (300, 6))
        qs = rng.uniform(0, 1, (41, 6))  # not divisible by 8 on purpose
        d, i = parallel.knn_query_sharded(pts, qs, 5, mesh=mesh1d)
        od, oi = oracle(pts, qs, 5)
        np.testing.assert_allclose(np.asarray(d), od, rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(i), oi)


class TestPointsSharded:
    def test_matches_single_device(self, rng, mesh1d):
        pts = rng.uniform(0, 1, (301, 4))  # ragged shards
        qs = rng.uniform(0, 1, (17, 4))
        d, i = parallel.knn_points_sharded(pts, qs, 7, mesh=mesh1d)
        od, oi = oracle(pts, qs, 7)
        np.testing.assert_allclose(np.asarray(d), od, rtol=1e-12)
        for r in range(17):
            assert set(np.asarray(i)[r].tolist()) == set(oi[r].tolist())

    def test_k_greater_than_shard(self, rng, mesh1d):
        # k larger than any single shard's row count
        pts = rng.uniform(0, 1, (40, 3))  # 5 rows/shard < k=20
        qs = rng.uniform(0, 1, (4, 3))
        d, i = parallel.knn_points_sharded(pts, qs, 20, mesh=mesh1d)
        od, oi = oracle(pts, qs, 20)
        np.testing.assert_allclose(np.asarray(d), od, rtol=1e-12)


class TestRing:
    def test_matches_single_device(self, rng, mesh2d):
        pts = rng.uniform(0, 1, (222, 5))
        qs = rng.uniform(0, 1, (33, 5))
        d, i = parallel.knn_ring(pts, qs, 6, mesh=mesh2d)
        od, oi = oracle(pts, qs, 6)
        np.testing.assert_allclose(np.asarray(d), od, rtol=1e-12)
        for r in range(33):
            assert set(np.asarray(i)[r].tolist()) == set(oi[r].tolist())

    def test_nan_padding_never_selected(self, rng, mesh2d):
        pts = rng.uniform(0, 1, (10, 2))  # heavy padding: 10 -> 12 rows
        qs = rng.uniform(0, 1, (5, 2))
        d, i = parallel.knn_ring(pts, qs, 10, mesh=mesh2d)
        i = np.asarray(i)
        assert (i >= 0).all() and (i < 10).all()
        assert np.isfinite(np.asarray(d)).all()


class TestTreeQuerySharded:
    def test_matches_single_device(self, rng, mesh1d):
        from petal_neighbors_tpu import BallTree, parallel
        pts = rng.uniform(0, 1, (400, 3))
        qs = rng.uniform(0, 1, (29, 3))  # ragged on purpose
        tree = BallTree.euclidean(pts, leaf_size=16)
        d, i = parallel.tree_query_sharded(tree, qs, 6, mesh=mesh1d)
        d1, i1 = tree.query_batch(qs, 6)
        np.testing.assert_allclose(np.asarray(d), np.asarray(d1), rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i1))

    def test_cosine_tree_sharded(self, rng, mesh1d):
        from petal_neighbors_tpu import BallTree, Cosine, parallel
        pts = rng.standard_normal((160, 5))
        qs = rng.standard_normal((13, 5))
        tree = BallTree(pts, Cosine(), leaf_size=16)
        d, i = parallel.tree_query_sharded(tree, qs, 4, mesh=mesh1d)
        d1, i1 = tree.query_batch(qs, 4)
        np.testing.assert_allclose(np.asarray(d), np.asarray(d1), rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i1))


class TestFeatureSharded:
    def test_matches_single_device(self, rng, mesh1d):
        pts = rng.uniform(0, 1, (200, 19)).astype(np.float64)  # ragged dim
        qs = rng.uniform(0, 1, (12, 19)).astype(np.float64)
        d, i = parallel.knn_feature_sharded(pts, qs, 6, mesh=mesh1d)
        od, oi = oracle(pts, qs, 6)
        np.testing.assert_allclose(np.asarray(d), od, rtol=1e-10)
        for r in range(12):
            assert set(np.asarray(i)[r].tolist()) == set(oi[r].tolist())

    def test_non_euclidean_rejected(self, rng, mesh1d):
        from petal_neighbors_tpu import Cosine
        with pytest.raises(ValueError):
            parallel.knn_feature_sharded(
                rng.uniform(0, 1, (10, 4)), rng.uniform(0, 1, (2, 4)), 2,
                Cosine(), mesh=mesh1d)


class TestRadiusSharded:
    """Sharded radius search (DBSCAN at mesh scale): counts and capped
    ids must match the single-device dense mask on every scheme."""

    def _data(self, rng, n=700, dim=5, q=37):
        pts = rng.standard_normal((n, dim)).astype(np.float32)
        qs = rng.standard_normal((q, dim)).astype(np.float32)
        return pts, qs

    def _dense(self, pts, qs, r):
        return np.asarray(bf.radius_mask(pts, qs, r))

    def test_query_dp_counts(self, rng, mesh1d):
        pts, qs = self._data(rng)
        cnt = parallel.radius_query_sharded(pts, qs, 1.1, mesh=mesh1d)
        want = self._dense(pts, qs, 1.1).sum(1)
        np.testing.assert_array_equal(np.asarray(cnt), want)

    def test_query_dp_capped_ids(self, rng, mesh1d):
        pts, qs = self._data(rng)
        ids, cnt = parallel.radius_query_sharded(pts, qs, 1.1, mesh=mesh1d,
                                                 cap=64)
        dense = self._dense(pts, qs, 1.1)
        want_ids, want_cnt = (np.asarray(x)
                              for x in bf.compact_mask(dense, 64))
        np.testing.assert_array_equal(np.asarray(ids), want_ids)
        np.testing.assert_array_equal(np.asarray(cnt), want_cnt)

    def test_points_sharded_counts(self, rng, mesh1d):
        pts, qs = self._data(rng, n=701)    # uneven shards (NaN padding)
        cnt = parallel.radius_points_sharded(pts, qs, 1.1, mesh=mesh1d)
        want = self._dense(pts, qs, 1.1).sum(1)
        np.testing.assert_array_equal(np.asarray(cnt), want)

    def test_points_sharded_capped_ids(self, rng, mesh1d):
        pts, qs = self._data(rng, n=701)
        ids, cnt = parallel.radius_points_sharded(pts, qs, 1.1,
                                                  mesh=mesh1d, cap=64)
        dense = self._dense(pts, qs, 1.1)
        want_ids, want_cnt = (np.asarray(x)
                              for x in bf.compact_mask(dense, 64))
        np.testing.assert_array_equal(np.asarray(cnt), want_cnt)
        np.testing.assert_array_equal(np.asarray(ids), want_ids)

    def test_points_sharded_cap_spans_shards(self, rng, mesh1d):
        """cap larger than one shard's member count: the first-cap-per-
        shard union must still realize the global first-cap contract."""
        pts, qs = self._data(rng, n=640)
        r = 4.0                              # nearly everything matches
        ids, cnt = parallel.radius_points_sharded(pts, qs, r, mesh=mesh1d,
                                                  cap=200)
        dense = self._dense(pts, qs, r)
        want_ids, want_cnt = (np.asarray(x)
                              for x in bf.compact_mask(dense, 200))
        np.testing.assert_array_equal(np.asarray(ids), want_ids)
        np.testing.assert_array_equal(np.asarray(cnt), want_cnt)

    def test_nan_query_and_strict_boundary(self, rng, mesh1d):
        pts, qs = self._data(rng)
        qs[2] = np.nan                       # NaN query: empty result
        pts[5] = qs[0]                       # exact-boundary at r=0
        cnt_in = parallel.radius_query_sharded(pts, qs, 0.0, mesh=mesh1d,
                                               inclusive=True)
        cnt_st = parallel.radius_query_sharded(pts, qs, 0.0, mesh=mesh1d,
                                               inclusive=False)
        assert np.asarray(cnt_in)[0] >= 1    # self at distance 0
        assert np.asarray(cnt_st)[0] == 0    # strict d < 0 matches nothing
        assert np.asarray(cnt_in)[2] == 0


class TestShardedMST:
    def test_weights_match_single_device(self, rng, mesh1d):
        from petal_neighbors_tpu.trees import mutual_reachability_mst

        pts = rng.normal(size=(333, 8))  # not divisible by 8 on purpose
        us, vs, ws = parallel.mutual_reachability_mst_sharded(
            pts, 5, mesh=mesh1d)
        assert len(ws) == len(pts) - 1
        _, _, ws1 = mutual_reachability_mst(pts, 5, scheme="scan")
        # identical weight multiset (the MST-uniqueness-up-to-ties
        # contract shared with the single-device tests)
        np.testing.assert_allclose(np.sort(ws), np.sort(ws1), rtol=1e-12)

    def test_spanning_and_finite(self, rng, mesh1d):
        pts = rng.uniform(0, 1, (64, 4))
        us, vs, ws = parallel.mutual_reachability_mst_sharded(
            pts, 3, mesh=mesh1d)
        assert np.isfinite(ws).all()
        # the edge set spans: union-find over the returned edges
        parent = list(range(len(pts)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(us, vs):
            parent[find(int(a))] = find(int(b))
        assert len({find(i) for i in range(len(pts))}) == 1

    def test_nan_rejected(self, rng, mesh1d):
        pts = rng.normal(size=(32, 4))
        pts[3, 1] = np.nan
        with pytest.raises(ValueError, match="finite"):
            parallel.mutual_reachability_mst_sharded(pts, 3, mesh=mesh1d)
