"""Metric-layer tests, replicating the reference's distance.rs test module
(distance.rs:124-183) plus batched-path consistency checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from petal_neighbors_tpu import distance
from petal_neighbors_tpu.distance import Cosine, Euclidean, Minkowski, get_metric, pairwise


class TestEuclidean:
    def test_pair_distance(self):
        m = Euclidean()
        x = jnp.array([3.0, 4.0])
        y = jnp.array([0.0, 0.0])
        assert float(m.distance(x, y)) == pytest.approx(5.0)
        assert float(m.rdistance(x, y)) == pytest.approx(25.0)
        assert float(m.rdistance_to_distance(25.0)) == pytest.approx(5.0)
        assert float(m.distance_to_rdistance(5.0)) == pytest.approx(25.0)

    def test_batch_matches_pair(self, rng):
        m = Euclidean()
        x = rng.standard_normal((7, 5))
        q = rng.standard_normal((3, 5))
        batch = np.asarray(m.dist(q, x))
        for i in range(3):
            for j in range(7):
                assert batch[i, j] == pytest.approx(
                    float(np.linalg.norm(q[i] - x[j])), rel=1e-6)

    def test_rdist_nonnegative_close_points(self):
        m = Euclidean()
        x = jnp.array([[1.0000001, 2.0], [1.0, 2.0]])
        rd = np.asarray(m.rdist(x, x))
        assert (rd >= 0).all()


class TestCosine:
    """Replicates distance.rs:143-182."""

    def test_orthogonal(self):
        m = Cosine()
        assert float(m.distance(jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0]))) == pytest.approx(1.0, abs=1e-6)

    def test_identical(self):
        m = Cosine()
        v = jnp.array([1.0, 2.0, 3.0])
        assert float(m.distance(v, v)) == pytest.approx(0.0, abs=1e-6)
        assert float(m.rdistance(v, v)) == pytest.approx(0.0, abs=1e-6)

    def test_opposite(self):
        m = Cosine()
        v5 = jnp.array([1.0, 1.0])
        v6 = jnp.array([-1.0, -1.0])
        assert float(m.distance(v5, v6)) == pytest.approx(2.0, abs=1e-6)
        assert float(m.rdistance(v5, v6)) == pytest.approx(2.0, abs=1e-6)

    def test_parallel(self):
        m = Cosine()
        assert float(m.distance(jnp.array([3.0, 4.0]), jnp.array([6.0, 8.0]))) == pytest.approx(0.0, abs=1e-6)

    def test_batch_matches_pair(self, rng):
        m = Cosine()
        x = rng.standard_normal((6, 4))
        q = rng.standard_normal((2, 4))
        batch = np.asarray(m.rdist(q, x))
        for i in range(2):
            for j in range(6):
                assert batch[i, j] == pytest.approx(
                    float(m.distance(jnp.asarray(q[i]), jnp.asarray(x[j]))), abs=1e-6)

    def test_conversions_identity(self):
        m = Cosine()
        assert float(m.rdistance_to_distance(0.3)) == pytest.approx(0.3)
        assert float(m.distance_to_rdistance(0.3)) == pytest.approx(0.3)


class TestMinkowski:
    def test_p2_matches_euclidean(self, rng):
        x = rng.standard_normal((5, 3))
        q = rng.standard_normal((2, 3))
        d2 = np.asarray(Minkowski(2.0).dist(q, x))
        de = np.asarray(Euclidean().dist(q, x))
        np.testing.assert_allclose(d2, de, rtol=1e-6)

    def test_p1_manhattan(self):
        m = Minkowski(1.0)
        d = float(m.distance(jnp.array([0.0, 0.0]), jnp.array([1.0, 2.0])))
        assert d == pytest.approx(3.0)

    def test_invalid_p(self):
        with pytest.raises(ValueError):
            Minkowski(0.5)


class TestPairwise:
    def test_two_points(self):
        """distance.rs:129-134."""
        x = jnp.array([[3.0, 4.0], [0.0, 0.0]])
        d = np.asarray(pairwise(x, Euclidean()))
        np.testing.assert_allclose(d, [[0.0, 5.0], [5.0, 0.0]], atol=1e-12)

    def test_one_point(self):
        """distance.rs:136-141: n < 2 returns zeros."""
        d = np.asarray(pairwise(jnp.array([[0.0]]), Euclidean()))
        np.testing.assert_array_equal(d, [[0.0]])

    def test_symmetry_and_zero_diag(self, rng):
        x = rng.standard_normal((9, 4))
        d = np.asarray(pairwise(x, Euclidean()))
        np.testing.assert_array_equal(d, d.T)  # bit-exact mirror
        np.testing.assert_array_equal(np.diag(d), np.zeros(9))


class TestRegistry:
    def test_get_by_name(self):
        assert isinstance(get_metric("euclidean"), Euclidean)
        assert isinstance(get_metric("cosine"), Cosine)
        assert get_metric("minkowski", p=3).p == 3.0

    def test_instance_passthrough(self):
        m = Euclidean()
        assert get_metric(m) is m

    def test_unknown(self):
        with pytest.raises(ValueError):
            get_metric("chebyshev99")

    def test_metric_equality(self):
        """Mirrors ball_tree_metric (ball_tree.rs:640-647)."""
        assert Euclidean() == Euclidean()
        assert Cosine() == Cosine()
        assert Euclidean() != Cosine()
        assert Minkowski(2) == Minkowski(2)
        assert Minkowski(2) != Minkowski(3)


class TestExtraMetrics:
    def test_manhattan(self, rng):
        from petal_neighbors_tpu import Manhattan
        m = Manhattan()
        x = rng.standard_normal((6, 4))
        q = rng.standard_normal((3, 4))
        got = np.asarray(m.rdist(q, x))
        want = np.abs(q[:, None] - x[None]).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-12)
        assert float(m.distance(jnp.zeros(2), jnp.array([1.0, 2.0]))) == pytest.approx(3.0)

    def test_chebyshev(self, rng):
        from petal_neighbors_tpu import Chebyshev
        m = Chebyshev()
        x = rng.standard_normal((6, 4))
        q = rng.standard_normal((3, 4))
        got = np.asarray(m.rdist(q, x))
        want = np.abs(q[:, None] - x[None]).max(-1)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_haversine_known_values(self):
        from petal_neighbors_tpu import Haversine
        m = Haversine()
        # quarter circle along a meridian: lat 0 -> pi/2
        d = float(m.distance(jnp.array([0.0, 0.0]),
                             jnp.array([np.pi / 2, 0.0])))
        assert d == pytest.approx(np.pi / 2, rel=1e-6)
        # antipodal on the equator
        d = float(m.distance(jnp.array([0.0, 0.0]),
                             jnp.array([0.0, np.pi])))
        assert d == pytest.approx(np.pi, rel=1e-6)

    def test_haversine_tree_query(self, rng):
        from petal_neighbors_tpu import BallTree, Haversine
        lat = rng.uniform(-np.pi / 3, np.pi / 3, (200, 1))
        lon = rng.uniform(-np.pi, np.pi, (200, 1))
        pts = np.concatenate([lat, lon], 1)
        t = BallTree(pts, Haversine(), leaf_size=16)
        q = pts[:5]
        d, i = t.query_batch(q, 3)
        # oracle
        m = Haversine()
        od = np.asarray(m.rdistance_to_distance(m.rdist(q, pts)))
        oi = np.argsort(od, axis=1)[:, :3]
        for r in range(5):
            assert set(np.asarray(i[r]).tolist()) == set(oi[r].tolist())

    def test_registry_names(self):
        from petal_neighbors_tpu.distance import get_metric, Manhattan, Chebyshev, Haversine
        assert isinstance(get_metric("manhattan"), Manhattan)
        assert isinstance(get_metric("cityblock"), Manhattan)
        assert isinstance(get_metric("chebyshev"), Chebyshev)
        assert isinstance(get_metric("haversine"), Haversine)


class TestPairwiseAccuracy:
    def test_uncentered_high_dim_f32(self, rng):
        """pairwise() must survive large-mean f32 data at dim > 32: the
        un-centered matmul form showed ~500% relative error (ADVICE r1);
        centering (translation-invariant) restores exactness."""
        x32 = (rng.standard_normal((64, 64)) * 0.1 + 100.0).astype(np.float32)
        d = np.asarray(pairwise(x32))
        x64 = x32.astype(np.float64)
        diff = x64[:, None, :] - x64[None, :, :]
        oracle = np.sqrt(np.sum(diff * diff, axis=-1))
        np.fill_diagonal(oracle, 0.0)
        err = np.abs(d - oracle) / np.maximum(oracle, 1e-12)
        np.fill_diagonal(err, 0.0)
        assert float(err.max()) < 1e-3

    def test_nan_rows_do_not_poison_centering(self, rng):
        x = rng.standard_normal((8, 48)).astype(np.float32)
        x[3] = np.nan
        d = np.asarray(pairwise(x))
        finite = np.delete(np.arange(8), 3)
        sub = d[np.ix_(finite, finite)]
        assert np.isfinite(sub).all()


class TestSqEuclidean:
    def test_squared_domain(self):
        m = get_metric("sqeuclidean")
        x = jnp.array([3.0, 4.0])
        y = jnp.array([0.0, 0.0])
        assert float(m.distance(x, y)) == pytest.approx(25.0)
        assert float(m.rdistance_to_distance(25.0)) == pytest.approx(25.0)

    def test_bruteforce_query_squared(self, rng):
        from petal_neighbors_tpu import BruteForce
        pts = rng.standard_normal((50, 8)).astype(np.float32)
        idx = BruteForce(pts, "sqeuclidean")
        i, d = idx.query(pts[7], 3)
        assert i[0] == 7 and d[0] == pytest.approx(0.0, abs=1e-6)
        true = np.sum((pts - pts[7]) ** 2, axis=1)
        order = np.argsort(true, kind="stable")
        np.testing.assert_allclose(d, true[order[:3]], rtol=1e-5, atol=1e-6)

    def test_trees_reject(self, rng):
        from petal_neighbors_tpu import BallTree, VantagePointTree
        pts = rng.standard_normal((20, 4))
        with pytest.raises(ValueError, match="triangle"):
            BallTree(pts, "sqeuclidean")
        with pytest.raises(ValueError, match="triangle"):
            VantagePointTree(pts, "sqeuclidean")
