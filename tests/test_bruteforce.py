"""Brute-force exact search tests: numpy oracle, contracts, edge cases."""

import numpy as np
import pytest

from petal_neighbors_tpu import BruteForce, Cosine, Euclidean, EmptyArrayError, NotContiguousError
from petal_neighbors_tpu.ops import bruteforce as bf


def numpy_knn(points, queries, k):
    """Independent oracle: full sort of exact distances."""
    d = np.sqrt(((queries[:, None, :] - points[None, :, :]) ** 2).sum(-1))
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


class TestKnnOracle:
    @pytest.mark.parametrize("n,dim,q,k", [(40, 3, 10, 5), (100, 8, 7, 1),
                                           (257, 2, 33, 10), (64, 16, 5, 64)])
    def test_matches_oracle(self, rng, n, dim, q, k):
        pts = rng.uniform(0, 1, (n, dim))
        qs = rng.uniform(0, 1, (q, dim))
        d, i = bf.knn(pts, qs, k)
        od, oi = numpy_knn(pts, qs, k)
        np.testing.assert_allclose(np.asarray(d), od, rtol=1e-10, atol=1e-12)
        # neighbor *sets* must match (ties may reorder indices)
        for r in range(q):
            assert set(np.asarray(i[r]).tolist()) == set(oi[r].tolist())

    def test_chunking_invariance(self, rng):
        pts = rng.uniform(0, 1, (130, 4))
        qs = rng.uniform(0, 1, (9, 4))
        d1, i1 = bf.knn(pts, qs, 7, chunk=13)
        d2, i2 = bf.knn(pts, qs, 7, chunk=130)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-12)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_k_zero_empty(self, rng):
        """Reference: query with k=0 returns empty (ball_tree.rs:106-108)."""
        pts = rng.uniform(0, 1, (10, 3))
        d, i = bf.knn(pts, pts[:2], 0)
        assert d.shape == (2, 0) and i.shape == (2, 0)

    def test_k_greater_than_n(self, rng):
        """Reference: k > n returns n results (heap never fills)."""
        pts = rng.uniform(0, 1, (5, 3))
        d, i = bf.knn(pts, pts[:2], 9)
        assert d.shape == (2, 5)
        assert np.isfinite(np.asarray(d)).all()
        assert sorted(np.asarray(i[0]).tolist()) == [0, 1, 2, 3, 4]

    def test_ascending_order(self, rng):
        pts = rng.uniform(0, 1, (50, 3))
        d, _ = bf.knn(pts, pts[:4], 10)
        d = np.asarray(d)
        assert (np.diff(d, axis=1) >= 0).all()

    def test_nan_point_sorts_last(self, rng):
        """NaN coordinates make a point farthest (CHANGELOG.md:111-115)."""
        pts = rng.uniform(0, 1, (6, 3))
        pts[2, 1] = np.nan
        d, i = bf.knn(pts, np.zeros((1, 3)), 6)
        assert int(np.asarray(i)[0, -1]) == 2
        assert np.isinf(np.asarray(d)[0, -1])

    def test_cosine_metric(self, rng):
        pts = rng.standard_normal((30, 5))
        qs = rng.standard_normal((4, 5))
        d, i = bf.knn(pts, qs, 3, Cosine())
        # oracle
        pn = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
        od = 1 - qn @ pn.T
        oi = np.argsort(od, axis=1)[:, :3]
        for r in range(4):
            assert set(np.asarray(i[r]).tolist()) == set(oi[r].tolist())


class TestRadius:
    def test_mask_matches_oracle(self, rng):
        pts = rng.uniform(0, 1, (80, 3))
        qs = rng.uniform(0, 1, (6, 3))
        r = 0.4
        mask = np.asarray(bf.radius_mask(pts, qs, r))
        od = np.sqrt(((qs[:, None] - pts[None]) ** 2).sum(-1))
        np.testing.assert_array_equal(mask, od <= r)

    def test_compact(self, rng):
        pts = rng.uniform(0, 1, (50, 2))
        qs = rng.uniform(0, 1, (3, 2))
        mask = bf.radius_mask(pts, qs, 0.5)
        idx, counts = bf.compact_mask(mask, cap=50)
        m = np.asarray(mask)
        for r in range(3):
            want = np.flatnonzero(m[r])
            got = np.asarray(idx[r])[: int(counts[r])]
            np.testing.assert_array_equal(got, want)
            assert (np.asarray(idx[r])[int(counts[r]):] == -1).all()

    def test_strict_vs_inclusive(self):
        pts = np.array([[0.0], [1.0], [2.0]])
        q = np.array([[0.0]])
        inc = np.asarray(bf.radius_mask(pts, q, 1.0, inclusive=True))
        stc = np.asarray(bf.radius_mask(pts, q, 1.0, inclusive=False))
        np.testing.assert_array_equal(inc[0], [True, True, False])
        np.testing.assert_array_equal(stc[0], [True, False, False])


class TestBruteForceIndex:
    def test_query_nearest(self):
        """Mirrors the BallTree doctest (ball_tree.rs:69-78)."""
        pts = np.array([[1.0, 1.0], [1.0, 2.0], [9.0, 9.0]])
        idx = BruteForce.euclidean(pts)
        i, d = idx.query_nearest(np.array([8.0, 8.0]))
        assert i == 2
        assert d == pytest.approx(np.sqrt(2.0), abs=1e-8)

    def test_query(self):
        """Mirrors ball_tree.rs:93-100 doctest."""
        pts = np.array([[1.0, 1.0], [1.0, 2.0], [9.0, 9.0]])
        idx = BruteForce.euclidean(pts)
        i, d = idx.query(np.array([3.0, 3.0]), 2)
        np.testing.assert_array_equal(i, [1, 0])

    def test_query_radius(self):
        """Mirrors ball_tree.rs:128-135 doctest."""
        pts = np.array([[1.0, 0.0], [2.0, 0.0], [9.0, 0.0]])
        idx = BruteForce.euclidean(pts)
        np.testing.assert_array_equal(idx.query_radius(np.array([3.0, 0.0]), 1.5), [1])

    def test_empty_rejected(self):
        with pytest.raises(EmptyArrayError):
            BruteForce.euclidean(np.zeros((0, 2)))

    def test_fortran_rejected(self):
        """Mirrors ball_tree_column_base (ball_tree.rs:632-638)."""
        arr = np.asfortranarray(np.array([[1.0, 1.0], [1.0, 1.1], [9.0, 9.0]]))
        with pytest.raises(NotContiguousError):
            BruteForce.euclidean(arr)

    def test_batched(self, rng):
        pts = rng.uniform(0, 1, (60, 4)).astype(np.float32)
        idx = BruteForce.euclidean(pts)
        d, i = idx.query_batch(pts[:8], 3)
        assert d.shape == (8, 3)
        np.testing.assert_array_equal(np.asarray(i)[:, 0], np.arange(8))


class TestPallasFallbackSurfacing:
    def test_fallback_warns_once_and_stays_exact(self, rng, monkeypatch):
        """A failing Pallas kernel must warn (not silently serve the ~5x
        slower XLA path) and still return exact results."""
        from petal_neighbors_tpu.ops import bruteforce as bf

        pts = rng.standard_normal((64, 40)).astype(np.float32)
        qs = rng.standard_normal((8, 40)).astype(np.float32)

        def boom(*a, **k):
            raise RuntimeError("simulated kernel compile failure")

        monkeypatch.setattr(bf, "_pallas_eligible",
                            lambda *a, **k: True)
        monkeypatch.setattr(bf, "knn_pallas_prepadded", boom)
        monkeypatch.setattr(bf, "_fallback_warned", False)

        with pytest.warns(RuntimeWarning, match="Pallas"):
            d, i = bf.knn(pts, qs, 5)
        # second call: no repeat warning
        import warnings as _w
        with _w.catch_warnings():
            _w.simplefilter("error")
            bf.knn(pts, qs, 5)

        oracle = np.sqrt(np.sum(
            (qs[:, None, :].astype(np.float64)
             - pts[None, :, :].astype(np.float64)) ** 2, axis=-1))
        oi = np.argsort(oracle, axis=1, kind="stable")[:, :5]
        assert np.array_equal(np.sort(np.asarray(i)), np.sort(oi))

    def test_forced_pallas_still_raises(self, rng, monkeypatch):
        from petal_neighbors_tpu.ops import bruteforce as bf
        pts = rng.standard_normal((64, 40)).astype(np.float32)
        qs = rng.standard_normal((4, 40)).astype(np.float32)

        def boom(*a, **k):
            raise RuntimeError("simulated failure")

        monkeypatch.setattr(bf, "knn_pallas_prepadded", boom)
        with pytest.raises(RuntimeError, match="simulated"):
            bf.knn(pts, qs, 5, backend="pallas")


class TestRadiusIdDtypeContract:
    def test_all_indexes_return_int64_radius_ids(self, rng):
        """Radius-query ids are int64 across every index type (contract
        parity: the reference returns usize everywhere)."""
        import petal_neighbors_tpu as pn
        pts = rng.standard_normal((60, 6)).astype(np.float32)
        q = pts[0]
        for idx in (pn.BallTree.euclidean(pts),
                    pn.VantagePointTree.euclidean(pts),
                    pn.BruteForce.euclidean(pts),
                    pn.DynamicIndex(pts)):
            out = idx.query_radius(q, 1.0)
            assert out.dtype == np.int64, type(idx).__name__


def test_sqeuclidean_never_takes_pallas_path(rng, monkeypatch):
    """The fused kernel converts rdist->distance with a hardcoded sqrt,
    so SqEuclidean (identity conversion) must never be routed to it."""
    from petal_neighbors_tpu.distance import SqEuclidean
    from petal_neighbors_tpu.ops import bruteforce as bf
    import petal_neighbors_tpu.ops.pallas.knn_kernel as kk
    monkeypatch.setattr(kk, "pallas_available", lambda: True)
    pts = rng.standard_normal((8192, 64)).astype(np.float32)
    qs = rng.standard_normal((4, 64)).astype(np.float32)
    import jax.numpy as jnp
    assert not bf._pallas_eligible(jnp.asarray(pts), jnp.asarray(qs), 5,
                                   SqEuclidean())
    assert bf._pallas_eligible(jnp.asarray(pts), jnp.asarray(qs), 5,
                               bf.Euclidean())
