"""BallTree tests replicating the reference's ball_tree.rs test module
(ball_tree.rs:615-895) plus batched-path and leaf-size invariance checks."""

import numpy as np
import pytest

from petal_neighbors_tpu import BallTree, EmptyArrayError, NotContiguousError, Euclidean
from petal_neighbors_tpu.trees import ball_build
from petal_neighbors_tpu.utils.tree_math import tree_shape

BUILDERS = ["vectorized", "reference"]
LEAF_SIZES = [None, 4, 128]


def numpy_knn(points, query, k):
    d = np.sqrt(((points - query[None, :]) ** 2).sum(-1))
    order = np.argsort(d, kind="stable")[:k]
    return d[order], order


class TestConstruction:
    def test_empty_rejected(self):
        """ball_tree.rs:623-630."""
        with pytest.raises(EmptyArrayError):
            BallTree.euclidean(np.zeros((0, 2)))

    def test_fortran_rejected(self):
        """ball_tree_column_base (ball_tree.rs:632-638)."""
        arr = np.asfortranarray([[1.0, 1.0], [1.0, 1.1], [9.0, 9.0]])
        with pytest.raises(NotContiguousError):
            BallTree.euclidean(arr)

    def test_metric_equality(self):
        """ball_tree_metric (ball_tree.rs:640-647)."""
        arr = np.array([[1.0, 1.0], [1.0, 1.1], [9.0, 9.0]])
        t1 = BallTree(arr, Euclidean())
        t2 = BallTree.euclidean(arr)
        assert t1.metric == t2.metric

    def test_reference_tree_sizing(self):
        """height/size formula parity (ball_tree.rs:51-52)."""
        for n, h in [(1, 1), (2, 2), (3, 2), (4, 3), (5, 3), (40, 6), (64, 7)]:
            s = tree_shape(n, None)
            assert s.height == h
            assert s.n_nodes == 2 ** h - 1

    def test_idx_is_permutation(self, rng):
        pts = rng.uniform(0, 1, (37, 3))
        for b in BUILDERS:
            t = BallTree.euclidean(pts, leaf_size=None, builder=b)
            assert sorted(t.idx.tolist()) == list(range(37))


class TestBallTree3:
    """ball_tree_3 (ball_tree.rs:649-698)."""

    @pytest.fixture
    def tree(self):
        return BallTree.euclidean(
            np.array([[1.0, 1.0], [1.0, 1.1], [9.0, 9.0]]), leaf_size=None)

    def test_origin(self, tree):
        i, d = tree.query_nearest(np.array([0.0, 0.0]))
        assert i == 0
        assert d == pytest.approx(np.sqrt(2.0))
        idx, dist = tree.query(np.array([0.0, 0.0]), 0)
        assert len(idx) == 0 and len(dist) == 0
        idx, dist = tree.query(np.array([0.0, 0.0]), 1)
        assert idx[0] == 0 and dist[0] == pytest.approx(np.sqrt(2.0))
        nb = sorted(tree.query_radius(np.array([0.0, 0.0]), 2.0).tolist())
        assert nb == [0, 1]

    def test_far_query_radius_empty(self, tree):
        assert tree.query_radius(np.array([20.0, 20.0]), 1.0).size == 0

    def test_near_11_12(self, tree):
        i, d = tree.query_nearest(np.array([1.1, 1.2]))
        assert i == 1
        assert d == pytest.approx(np.sqrt(2 * 0.1 ** 2))

    def test_77(self, tree):
        i, d = tree.query_nearest(np.array([7.0, 7.0]))
        assert i == 2
        assert d == pytest.approx(np.sqrt(8.0))


class TestBallTree6:
    def test_nearest(self):
        """ball_tree_6 (ball_tree.rs:700-716)."""
        pts = np.array([[1.0, 2.0], [1.1, 2.2], [0.9, 1.9],
                        [1.0, 2.1], [-2.0, 3.0], [-2.2, 3.1]])
        for leaf in LEAF_SIZES:
            t = BallTree.euclidean(pts, leaf_size=leaf)
            i, d = t.query_nearest(np.array([1.0, 2.0]))
            assert i == 0
            assert d == pytest.approx(0.0, abs=1e-12)


class TestIdenticalPoints:
    def test_zero_radius_balls(self):
        """ball_tree_identical_points (ball_tree.rs:718-740)."""
        pts = np.ones((8, 2))
        t = BallTree.euclidean(pts, leaf_size=None)
        _, d = t.query_nearest(np.array([1.0, 2.0]))
        assert d == pytest.approx(1.0)
        _, d = t.query_nearest(np.array([1.0, 1.0]))
        assert d == pytest.approx(0.0, abs=1e-12)


class TestQueryOracle:
    """ball_tree_query (ball_tree.rs:742-765): tree == brute force."""

    @pytest.mark.parametrize("builder", BUILDERS)
    @pytest.mark.parametrize("leaf_size", LEAF_SIZES)
    def test_random_40x3(self, rng, builder, leaf_size):
        pts = rng.uniform(0, 1, (40, 3))
        t = BallTree.euclidean(pts, leaf_size=leaf_size, builder=builder)
        for _ in range(10):
            q = rng.uniform(0, 1, 3)
            _, dist = t.query(q, 5)
            od, _ = numpy_knn(pts, q, 5)
            np.testing.assert_allclose(dist, od, rtol=1e-10, atol=1e-12)

    def test_batched_matches_oracle(self, rng):
        pts = rng.uniform(0, 1, (200, 5))
        qs = rng.uniform(0, 1, (50, 5))
        t = BallTree.euclidean(pts, leaf_size=16)
        d, i = t.query_batch(qs, 7)
        d, i = np.asarray(d), np.asarray(i)
        for r in range(50):
            od, oi = numpy_knn(pts, qs[r], 7)
            np.testing.assert_allclose(d[r], od, rtol=1e-9, atol=1e-12)
            assert set(i[r].tolist()) == set(oi.tolist())

    def test_k_bigger_than_n(self, rng):
        pts = rng.uniform(0, 1, (6, 2))
        t = BallTree.euclidean(pts)
        idx, dist = t.query(pts[0], 50)
        assert len(idx) == 6
        assert (np.diff(dist) >= 0).all()

    def test_ascending(self, rng):
        pts = rng.uniform(0, 1, (64, 4))
        t = BallTree.euclidean(pts, leaf_size=4)
        _, dist = t.query(rng.uniform(0, 1, 4), 10)
        assert (np.diff(dist) >= 0).all()


class TestQueryRadius:
    def test_1d_grid(self):
        """ball_tree_query_radius (ball_tree.rs:767-782)."""
        pts = np.array([[0.0], [2.0], [3.0], [4.0], [6.0], [8.0], [10.0]])
        for leaf in LEAF_SIZES:
            t = BallTree.euclidean(pts, leaf_size=leaf)
            assert sorted(t.query_radius(np.array([0.1]), 1.0).tolist()) == [0]
            assert sorted(t.query_radius(np.array([3.2]), 1.0).tolist()) == [2, 3]
            assert t.query_radius(np.array([9.0]), 0.9).size == 0

    @pytest.mark.parametrize("leaf_size", LEAF_SIZES)
    def test_oracle_random(self, rng, leaf_size):
        pts = rng.uniform(0, 1, (120, 3))
        qs = rng.uniform(0, 1, (15, 3))
        t = BallTree.euclidean(pts, leaf_size=leaf_size)
        mask = np.asarray(t.query_radius_batch(qs, 0.45))
        od = np.sqrt(((qs[:, None] - pts[None]) ** 2).sum(-1))
        # off-boundary radii: strict-vs-inclusive cannot differ
        np.testing.assert_array_equal(mask, od < 0.45)

    def test_boundary_take_vs_scan(self):
        """The reference's boundary quirk (ball_tree.rs:271-277): a point at
        exactly distance r is included via the whole-subtree take (ub <= r,
        inclusive) but excluded by the leaf scan (strict d < r).

        All coordinates are binary-exact so the boundary comparisons are
        deterministic.  Tree (leaf_size=None, n=3): leaves are {1.0} and
        {1.5, 9.0} (centroid 5.25, radius 3.75).
        """
        pts = np.array([[1.0], [1.5], [9.0]])
        t = BallTree.euclidean(pts, leaf_size=None)
        # query 0.5, r=1.0: leaf {1.5, 9.0} has lb == 1.0 == r -> scanned;
        # d(0.5, 1.5) == 1.0 == r -> strict scan EXCLUDES point 1.
        got = sorted(t.query_radius(np.array([0.5]), 1.0).tolist())
        assert got == [0]
        # query 5.25, r=3.75: leaf {1.5, 9.0} has ub == 3.75 == r ->
        # inclusive take INCLUDES point 1 even though d == r exactly.
        got = sorted(t.query_radius(np.array([5.25]), 3.75).tolist())
        assert got == [1, 2]

    def test_compact_output(self, rng):
        pts = rng.uniform(0, 1, (60, 2))
        qs = rng.uniform(0, 1, (4, 2))
        t = BallTree.euclidean(pts, leaf_size=8)
        idx, counts = t.query_radius_batch(qs, 0.3, cap=60)
        mask = np.asarray(t.query_radius_batch(qs, 0.3))
        for r in range(4):
            want = np.flatnonzero(mask[r])
            got = np.asarray(idx[r])[: int(counts[r])]
            np.testing.assert_array_equal(np.sort(got), want)


class TestNodeInit:
    def test_centroid_radius(self):
        """node_init (ball_tree.rs:784-798): centroid = mean, radius = max
        metric distance from centroid."""
        pts = np.array([[0.0, 1.0], [0.0, 9.0], [0.0, 2.0]])
        t = BallTree.euclidean(pts, leaf_size=None)
        root = t.nodes[0]
        np.testing.assert_allclose(root.centroid, [0.0, 4.0], atol=1e-12)
        assert root.radius == pytest.approx(5.0)


class TestAccessors:
    @pytest.fixture
    def tree(self, rng):
        return BallTree.euclidean(rng.uniform(0, 1, (20, 3)), leaf_size=None)

    def test_children_of(self, tree):
        assert tree.children_of(0) == (1, 2)
        leaf = tree.num_nodes() - 1
        assert tree.children_of(leaf) is None

    def test_points_of_partition(self, tree):
        left, right = tree.children_of(0)
        pl = set(tree.points_of(left).tolist())
        pr = set(tree.points_of(right).tolist())
        assert pl | pr == set(range(20))
        assert not (pl & pr)

    def test_node_distance_lower_bound(self, tree):
        lb = tree.node_distance_lower_bound(1, 2)
        assert lb >= 0.0
        # lower bound must be <= the actual min cross-pair distance
        pl = tree.points_of(1)
        pr = tree.points_of(2)
        pts = np.asarray(tree.points)
        dmin = min(np.linalg.norm(pts[i] - pts[j])
                   for i in pl for j in pr)
        assert lb <= dmin + 1e-9

    def test_node_distance_lower_bound_oob(self, tree):
        with pytest.raises(IndexError):
            tree.node_distance_lower_bound(0, 10 ** 6)

    def test_radius_and_compare(self, tree):
        assert tree.radius_of(0) >= tree.radius_of(1) or True  # well-defined
        assert tree.compare_nodes(0, 0) == 0
        c = tree.compare_nodes(1, 2)
        assert c in (-1, 0, 1)

    def test_counts(self, tree):
        assert tree.num_points() == 20
        assert tree.num_nodes() == len(tree.nodes)


class TestBuilderHelpers:
    """Panic-contract analogues for the private helpers
    (ball_tree.rs:800-866)."""

    def test_halve_one(self):
        idx = np.array([0])
        ball_build._halve_node_indices(idx, np.array([1.0]))
        np.testing.assert_array_equal(idx, [0])

    def test_halve_odd(self):
        col = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
        idx = np.array([0, 1, 4, 3, 2])
        ball_build._halve_node_indices(idx, col)
        assert idx[0] < idx[2] and idx[1] < idx[2]
        assert idx[2] <= idx[3] and idx[2] <= idx[4]

    def test_halve_even(self):
        col = np.array([1.0, 2.0, 3.0, 4.0])
        idx = np.array([3, 2, 1, 0])
        ball_build._halve_node_indices(idx, col)
        assert idx[0] < idx[2] and idx[1] < idx[2]
        assert idx[2] <= idx[3]

    def test_max_spread_column(self):
        pts = np.array([[0.0, 1.0], [0.0, 9.0], [0.0, 2.0]])
        assert ball_build._max_spread_column(pts, np.array([0, 1, 2])) == 1

    def test_builders_agree_on_geometry(self, rng):
        """Same tree geometry (centroids/radii) from both builders on
        tie-free data; idx may differ only within segments."""
        pts = rng.uniform(0, 1, (33, 4))
        s = tree_shape(33, None)
        m = Euclidean()
        a = ball_build.build_host_vectorized(pts, s, m)
        b = ball_build.build_reference_order(pts, s, m)
        np.testing.assert_allclose(a.centroids, b.centroids, atol=1e-12)
        np.testing.assert_allclose(a.radii, b.radii, atol=1e-12)
        np.testing.assert_array_equal(np.sort(a.idx), np.sort(b.idx))


class TestNaNPolicy:
    def test_nan_point_is_farthest(self, rng):
        pts = rng.uniform(0, 1, (10, 2))
        pts[3, 0] = np.nan
        t = BallTree.euclidean(pts, leaf_size=4)
        idx, dist = t.query(np.zeros(2), 10)
        assert idx[-1] == 3
        assert np.isinf(dist[-1])


class TestDeviceBuilder:
    def test_device_matches_host_geometry(self, rng):
        pts = rng.uniform(0, 1, (200, 5))
        td = BallTree.euclidean(pts, leaf_size=8, builder="device")
        th = BallTree.euclidean(pts, leaf_size=8, builder="vectorized")
        np.testing.assert_allclose(np.asarray(td.nodes.centroids),
                                   np.asarray(th.nodes.centroids), atol=1e-9)
        np.testing.assert_allclose(np.asarray(td.nodes.radii),
                                   np.asarray(th.nodes.radii), atol=1e-9)
        np.testing.assert_array_equal(td.idx, th.idx)

    def test_device_build_query_oracle(self, rng):
        pts = rng.uniform(0, 1, (150, 3))
        qs = rng.uniform(0, 1, (10, 3))
        t = BallTree.euclidean(pts, leaf_size=16, builder="device")
        d, i = t.query_batch(qs, 5)
        od = np.sqrt(((qs[:, None] - pts[None]) ** 2).sum(-1))
        oi = np.argsort(od, axis=1)[:, :5]
        for r in range(10):
            assert set(np.asarray(i[r]).tolist()) == set(oi[r].tolist())


class TestQueryStats:
    def test_stats_shape_and_sanity(self, rng):
        pts = rng.uniform(0, 1, (256, 3))
        qs = rng.uniform(0, 1, (10, 3))
        t = BallTree.euclidean(pts, leaf_size=16)
        d, i, stats = t.query_batch(qs, 5, with_stats=True)
        assert int(stats["n_leaves"]) == t.shape.n_leaves
        surv = np.asarray(stats["leaves_surviving_final_bound"])
        assert surv.shape == (10,)
        assert (surv >= 1).all() and (surv <= t.shape.n_leaves).all()
        pr = np.asarray(stats["prune_ratio"])
        assert ((pr >= 0) & (pr <= 1)).all()
        # results identical to the no-stats path
        d2, i2 = t.query_batch(qs, 5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))


class TestGenericMetrics:
    """The shared distance-kernel path under non-Euclidean metrics
    (BASELINE config #5's generic Distance trait)."""

    def test_cosine_tree_matches_bruteforce(self, rng):
        from petal_neighbors_tpu import Cosine
        pts = rng.standard_normal((120, 6))
        qs = rng.standard_normal((12, 6))
        t = BallTree(pts, Cosine(), leaf_size=8)
        d, i = t.query_batch(qs, 5)
        pn = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
        od = 1 - qn @ pn.T
        oi = np.argsort(od, axis=1)[:, :5]
        for r in range(12):
            # cosine violates the triangle inequality, so ball pruning is
            # heuristic in BOTH the reference and here; on this data the
            # bounds hold and results must match brute force
            assert set(np.asarray(i[r]).tolist()) == set(oi[r].tolist())

    def test_minkowski_tree_matches_bruteforce(self, rng):
        from petal_neighbors_tpu import Minkowski
        pts = rng.uniform(0, 1, (100, 4))
        qs = rng.uniform(0, 1, (10, 4))
        t = BallTree(pts, Minkowski(3.0), leaf_size=8)
        d, i = t.query_batch(qs, 4)
        od = (np.abs(qs[:, None] - pts[None]) ** 3).sum(-1) ** (1 / 3)
        oi = np.argsort(od, axis=1)[:, :4]
        for r in range(10):
            assert set(np.asarray(i[r]).tolist()) == set(oi[r].tolist())
        np.testing.assert_allclose(
            np.asarray(d), np.take_along_axis(od, oi, 1), rtol=1e-9)


class TestRadiusCounts:
    def test_counts_match_mask(self, rng):
        pts = rng.uniform(0, 1, (90, 3))
        qs = rng.uniform(0, 1, (7, 3))
        t = BallTree.euclidean(pts, leaf_size=16)
        counts = np.asarray(t.query_radius_count_batch(qs, 0.4))
        mask = np.asarray(t.query_radius_batch(qs, 0.4))
        np.testing.assert_array_equal(counts, mask.sum(1))


class TestTiledRadius:
    """Round-4 tile-shared radius frontier (scheme='tiled'): must agree
    with the dense mask path exactly — same membership semantics (the
    tile visits the UNION of its members' emitted leaves, but each member
    accepts only from its own flags)."""

    @pytest.mark.parametrize("leaf_size", [4, 32])
    def test_matches_mask(self, rng, leaf_size):
        pts = rng.uniform(0, 1, (400, 2))
        qs = rng.uniform(0, 1, (37, 2))     # non-multiple of tile_q
        t = BallTree.euclidean(pts, leaf_size=leaf_size)
        mask = np.asarray(t.query_radius_batch(qs, 0.25))
        ids, cnt = t.query_radius_batch(qs, 0.25, cap=400, scheme="tiled")
        ids, cnt = np.asarray(ids), np.asarray(cnt)
        for r in range(len(qs)):
            want = set(np.flatnonzero(mask[r]).tolist())
            assert set(ids[r][ids[r] >= 0].tolist()) == want, r
            assert cnt[r] == len(want)

    def test_boundary_semantics(self):
        """Binary-exact boundary fixture through the tiled path."""
        pts = np.array([[1.0], [1.5], [9.0]])
        t = BallTree.euclidean(pts, leaf_size=None)
        ids, cnt = t.query_radius_batch(np.array([[0.5]]), 1.0, cap=3,
                                        scheme="tiled")
        assert sorted(np.asarray(ids)[0][: int(cnt[0])].tolist()) == [0]
        ids, cnt = t.query_radius_batch(np.array([[5.25]]), 3.75, cap=3,
                                        scheme="tiled")
        assert sorted(np.asarray(ids)[0][: int(cnt[0])].tolist()) == [1, 2]

    def test_cap_overflow_counts_exact(self, rng):
        pts = rng.uniform(0, 1, (100, 2))
        t = BallTree.euclidean(pts, leaf_size=8)
        ids, cnt = t.query_radius_batch(pts[:3], 2.0, cap=10,
                                        scheme="tiled")
        assert (np.asarray(cnt) == 100).all()
        ids = np.asarray(ids)
        assert (ids >= 0).all() and ids.shape == (3, 10)

    def test_auto_routes_tiled_at_batch(self, rng):
        """auto == tiled at dim<=32, q>=512: results must match the
        per-query scheme on the same inputs."""
        pts = rng.uniform(0, 1, (600, 2)).astype(np.float32)
        qs = np.ascontiguousarray(pts[:512])
        t = BallTree.euclidean(pts, leaf_size=16)
        ia, ca = t.query_radius_batch(qs, 0.1, cap=64)             # auto
        ip, cp = t.query_radius_batch(qs, 0.1, cap=64,
                                      scheme="per_query")
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cp))
        for r in range(512):
            a = set(np.asarray(ia[r])[np.asarray(ia[r]) >= 0].tolist())
            b = set(np.asarray(ip[r])[np.asarray(ip[r]) >= 0].tolist())
            assert a == b, r

    def test_nan_query_and_nan_member(self, rng):
        """NaN query rows emit nothing (bounds descend but the strict
        scan rejects NaN distances); NaN members inside a wholly-taken
        node are included."""
        pts = np.array([[1.0, 1.0], [1.0, 1.0], [np.nan, 1.0],
                        [1.0, 1.0]])
        t = BallTree.euclidean(pts, leaf_size=None)
        qs = np.array([[1.0, 1.0], [np.nan, 1.0]])
        mask = np.asarray(t.query_radius_batch(qs, 100.0))
        ids, cnt = t.query_radius_batch(qs, 100.0, cap=4, scheme="tiled")
        for r in range(2):
            want = set(np.flatnonzero(mask[r]).tolist())
            got = set(np.asarray(ids)[r][: int(cnt[r])].tolist())
            assert got == want, r


class TestCappedRadius:
    """The tree-pruned capped radius path must agree with the dense mask
    path exactly (same membership semantics incl. boundary rules)."""

    @pytest.mark.parametrize("leaf_size", [None, 4, 128])
    def test_matches_mask(self, rng, leaf_size):
        pts = rng.uniform(0, 1, (300, 3))
        qs = rng.uniform(0, 1, (17, 3))
        t = BallTree.euclidean(pts, leaf_size=leaf_size)
        mask = np.asarray(t.query_radius_batch(qs, 0.3))
        ids, cnt = t.query_radius_batch(qs, 0.3, cap=300)
        ids, cnt = np.asarray(ids), np.asarray(cnt)
        for r in range(17):
            want = set(np.flatnonzero(mask[r]).tolist())
            got = set(ids[r][ids[r] >= 0].tolist())
            assert got == want, r
            assert cnt[r] == len(want)

    def test_boundary_semantics(self):
        """Binary-exact boundary fixture (same as the mask test)."""
        pts = np.array([[1.0], [1.5], [9.0]])
        t = BallTree.euclidean(pts, leaf_size=None)
        ids, cnt = t.query_radius_batch(np.array([[0.5]]), 1.0, cap=3)
        got = sorted(np.asarray(ids)[0][: int(cnt[0])].tolist())
        assert got == [0]
        ids, cnt = t.query_radius_batch(np.array([[5.25]]), 3.75, cap=3)
        got = sorted(np.asarray(ids)[0][: int(cnt[0])].tolist())
        assert got == [1, 2]

    def test_cap_overflow_detectable(self, rng):
        pts = rng.uniform(0, 1, (100, 2))
        t = BallTree.euclidean(pts, leaf_size=8)
        ids, cnt = t.query_radius_batch(pts[:3], 2.0, cap=10)  # all within
        cnt = np.asarray(cnt)
        assert (cnt == 100).all()          # true counts, beyond cap
        ids = np.asarray(ids)
        assert (ids >= 0).all() and ids.shape == (3, 10)

    def test_nan_member_in_taken_leaf(self):
        """A NaN point inside a wholly-taken node is included with no
        distance evaluation (reference bulk-take, ball_tree.rs:271-273)."""
        pts = np.array([[1.0, 1.0], [1.0, 1.0], [np.nan, 1.0],
                        [1.0, 1.0]])
        t = BallTree.euclidean(pts, leaf_size=None)
        mask = np.asarray(t.query_radius_batch(
            np.array([[1.0, 1.0]], dtype=np.float64), 100.0))
        ids, cnt = t.query_radius_batch(
            np.array([[1.0, 1.0]], dtype=np.float64), 100.0, cap=4)
        got = set(np.asarray(ids)[0][: int(cnt[0])].tolist())
        assert got == set(np.flatnonzero(mask[0]).tolist())

    def test_capped_cosine_metric(self, rng):
        from petal_neighbors_tpu import Cosine
        pts = rng.standard_normal((150, 4))
        qs = rng.standard_normal((9, 4))
        t = BallTree(pts, Cosine(), leaf_size=16)
        mask = np.asarray(t.query_radius_batch(qs, 0.4))
        ids, cnt = t.query_radius_batch(qs, 0.4, cap=150)
        ids, cnt = np.asarray(ids), np.asarray(cnt)
        for r in range(9):
            want = set(np.flatnonzero(mask[r]).tolist())
            got = set(ids[r][ids[r] >= 0].tolist())
            assert got == want, r


class TestRemainingContracts:
    def test_compare_nodes_nan_returns_none(self):
        """partial_cmp semantics (ball_tree.rs:341-343): NaN radius ->
        incomparable -> None."""
        pts = np.array([[0.0, 0.0], [np.nan, 1.0], [2.0, 2.0],
                        [3.0, 3.0]])
        t = BallTree.euclidean(pts, leaf_size=None)
        radii = np.asarray(t.nodes.radii)
        nan_nodes = np.flatnonzero(np.isnan(radii))
        ok_nodes = np.flatnonzero(~np.isnan(radii))
        if len(nan_nodes) and len(ok_nodes):
            assert t.compare_nodes(int(nan_nodes[0]), int(ok_nodes[0])) is None
        assert t.compare_nodes(int(ok_nodes[0]), int(ok_nodes[0])) == 0

    def test_backend_flags(self, rng):
        from petal_neighbors_tpu.ops import bruteforce as bf
        pts = rng.uniform(0, 1, (64, 40)).astype(np.float32)
        qs = rng.uniform(0, 1, (4, 40)).astype(np.float32)
        d_x, i_x = bf.knn(pts, qs, 3, backend="xla")
        d_a, i_a = bf.knn(pts, qs, 3, backend="auto")  # cpu -> xla
        np.testing.assert_allclose(np.asarray(d_x), np.asarray(d_a),
                                   rtol=1e-6)
        import pytest as _pt
        with _pt.raises(ValueError):
            # forced pallas with non-f32 data must raise the clear error
            bf.knn(pts.astype(np.float64), qs.astype(np.float64), 3,
                   backend="pallas")

    def test_rescore_disabled_still_close(self, rng):
        from petal_neighbors_tpu.ops import bruteforce as bf
        pts = rng.uniform(0, 1, (300, 64)).astype(np.float32)
        qs = rng.uniform(0, 1, (5, 64)).astype(np.float32)
        d1, _ = bf.knn(pts, qs, 4, backend="xla", rescore=True)
        d2, _ = bf.knn(pts, qs, 4, backend="xla", rescore=False)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   rtol=1e-3)


class TestTiledScheme:
    """Round-3 tile-shared leaf frontier: locality-sorted queries share
    one leaf visit order per tile — must stay exact vs brute force."""

    @pytest.mark.parametrize("n,d,q,k,leaf", [
        (5000, 2, 1024, 2, 128), (3000, 3, 700, 5, 64),
        (2000, 2, 600, 16, 32), (999, 2, 513, 1, 128),
    ])
    def test_exact_vs_brute(self, rng, n, d, q, k, leaf):
        from petal_neighbors_tpu import BruteForce
        pts = rng.uniform(0, 1, (n, d)).astype(np.float32)
        pts[17] = np.nan
        qs = rng.uniform(0, 1, (q, d)).astype(np.float32)
        t = BallTree.euclidean(pts, leaf_size=leaf)
        d_t, i_t = t.query_batch(qs, k, scheme="tiled")
        d_b, i_b = BruteForce.euclidean(pts).query_batch(qs, k)
        d_t, d_b = np.asarray(d_t), np.asarray(d_b)
        np.testing.assert_allclose(d_t, d_b, rtol=1e-6)
        # same neighbor sets wherever distances are distinct
        i_t, i_b = np.asarray(i_t), np.asarray(i_b)
        dist_ok = np.isclose(np.sort(d_t, 1), d_b, rtol=1e-6)
        assert dist_ok[np.isfinite(d_b)].all()

    def test_schemes_agree(self, rng):
        pts = rng.uniform(0, 1, (4000, 2)).astype(np.float32)
        qs = rng.uniform(0, 1, (800, 2)).astype(np.float32)
        t = BallTree.euclidean(pts, leaf_size=64)
        d1, _ = t.query_batch(qs, 4, scheme="tiled")
        d2, _ = t.query_batch(qs, 4, scheme="per_query")
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   rtol=1e-6)
