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


class TestRadiusMatmulPath:
    """High-dim f32 Euclidean radius membership via the MXU matmul form
    with a boundary band + direct-form rescore (exactness invariant:
    boundary decisions must match the direct path bit-for-bit)."""

    def _mk(self, rng, n=5000, dim=64, q=24):
        pts = ((rng.random((n, dim)) - 0.5) * 10).astype(np.float32)
        qs = ((rng.random((q, dim)) - 0.5) * 10).astype(np.float32)
        return pts, qs

    def _direct(self, pts, qs, r, inclusive):
        import jax.numpy as jnp
        inv = jnp.zeros((pts.shape[0],), dtype=bool)
        return np.asarray(bf._radius_mask_jit(
            jnp.asarray(pts), jnp.asarray(qs),
            jnp.asarray(r, dtype=np.float32), inv,
            metric=Euclidean(), inclusive=inclusive, chunk=1024))

    @pytest.mark.parametrize("inclusive", [True, False])
    def test_matches_direct_path(self, rng, inclusive):
        pts, qs = self._mk(rng)
        r = 11.0          # a radius with real membership at this scale
        fast = np.asarray(bf.radius_mask(pts, qs, r, inclusive=inclusive))
        np.testing.assert_array_equal(fast,
                                      self._direct(pts, qs, r, inclusive))

    def test_boundary_exact_points(self, rng):
        """Points at exactly distance r flip between inclusive/strict —
        the matmul band must hand them to the direct rescore."""
        pts, qs = self._mk(rng)
        r = np.float32(2.0)
        # exact-boundary points for query 0: r * e_j (q[0] pinned to 0)
        qs[0] = 0.0
        for j in range(5):
            pts[j] = 0.0
            pts[j, j] = r
        incl = np.asarray(bf.radius_mask(pts, qs, r, inclusive=True))
        strict = np.asarray(bf.radius_mask(pts, qs, r, inclusive=False))
        assert incl[0, :5].all()
        assert not strict[0, :5].any()

    def test_nan_rows_never_match(self, rng):
        pts, qs = self._mk(rng)
        pts[3] = np.nan
        pts[7, 0] = np.nan
        mask = np.asarray(bf.radius_mask(pts, qs, 50.0))
        assert not mask[:, 3].any() and not mask[:, 7].any()
        assert mask.sum() > 0

    def test_overflow_falls_back_to_direct(self, rng):
        """More boundary-band points than amb_cap: warns, re-runs the
        direct path, stays exact."""
        pts, qs = self._mk(rng)
        r = np.float32(3.0)
        qs[0] = 0.0
        for j in range(40):     # 40 points at exactly distance r
            pts[j] = 0.0
            pts[j, j % 64] = r
        with pytest.warns(RuntimeWarning, match="error band"):
            fast = np.asarray(bf.radius_mask(pts, qs, r, amb_cap=16))
        np.testing.assert_array_equal(fast, self._direct(pts, qs, r, True))
        assert fast[0, :40].all()

    def test_counts_and_compact_agree(self, rng):
        """Downstream ops (counts, capped compaction) over the matmul-path
        mask match the direct path."""
        pts, qs = self._mk(rng)
        fast = bf.radius_mask(pts, qs, 11.0)
        direct = self._direct(pts, qs, 11.0, True)
        np.testing.assert_array_equal(np.asarray(bf.radius_counts(fast)),
                                      direct.sum(1).astype(np.int32))


class TestCosineKernelMode:
    """Cosine served through the Euclidean fused kernel: on normalized
    rows, 1 − q̂·x̂ == ‖q̂−x̂‖²/2 exactly, so candidates + proof + rescore
    all reuse the Euclidean machinery with a final /2."""

    def _oracle(self, pts, qs, k):
        p = pts.astype(np.float64)
        q = qs.astype(np.float64)
        pn = np.linalg.norm(p, axis=1, keepdims=True)
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        d = 1.0 - (q / qn) @ (p / pn).T
        d = np.where(np.isnan(d), np.inf, d)
        oi = np.argsort(d, axis=1, kind="stable")[:, :k]
        return np.sort(d, axis=1)[:, :k], oi

    def test_prepadded_cosine_exact(self, rng):
        pts = (rng.random((1024, 64)) * 4 - 2).astype(np.float32)
        qs = (rng.random((64, 64)) * 4 - 2).astype(np.float32)
        k = 10
        import jax.numpy as jnp
        pp, pn, split, bad = bf.prepare_cosine_index(jnp.asarray(pts), 512)
        rd, ii = bf.knn_pallas_prepadded(pp, pn, jnp.asarray(qs), k, 1024,
                                         precision="high", pts_split=split,
                                         tq=64, tn=512, interpret=True,
                                         normalize_q=True, out_rdist=True)
        d = np.asarray(rd) * 0.5
        od, oi = self._oracle(pts, qs, k)
        ii = np.asarray(ii)
        for r in range(len(qs)):
            assert set(ii[r].tolist()) == set(oi[r].tolist()), r
        np.testing.assert_allclose(d, od, atol=2e-6)
        assert (np.diff(d, axis=1) >= 0).all()

    def test_class_end_to_end(self, rng, monkeypatch):
        """BruteForce(., Cosine()) kernel mode: exact, NaN and zero-norm
        rows excluded, served by the pallas backend."""
        from functools import partial
        import petal_neighbors_tpu.ops.pallas.knn_kernel as kk
        monkeypatch.setattr(kk, "pallas_available", lambda: True)
        monkeypatch.setattr(
            bf, "knn_pallas_prepadded",
            partial(bf.knn_pallas_prepadded.__wrapped__, interpret=True))
        pts = (rng.random((4608, 40)) * 4 - 2).astype(np.float32)
        pts[5] = 0.0                      # zero norm -> NaN -> farthest
        pts[9, 0] = np.nan
        qs = (rng.random((32, 40)) * 4 - 2).astype(np.float32)
        from petal_neighbors_tpu.distance import Cosine
        idx = BruteForce(pts, Cosine())
        assert idx._cosine_kernel
        d, i = idx.query_batch(qs, 5)
        assert idx.last_backend == "pallas"
        i = np.asarray(i)
        assert not np.isin(i, [5, 9]).any()
        od, oi = self._oracle(pts, qs, 5)
        for r in range(len(qs)):
            assert set(i[r].tolist()) == set(oi[r].tolist()), r
        np.testing.assert_allclose(np.asarray(d), od, atol=2e-6)

    def test_xla_fallback_agrees(self, rng, monkeypatch):
        """The class's XLA fallback on the normalized resident copy must
        return the same results as the kernel path (scale invariance)."""
        import petal_neighbors_tpu.ops.pallas.knn_kernel as kk
        monkeypatch.setattr(kk, "pallas_available", lambda: True)
        pts = (rng.random((4608, 40)) * 4 - 2).astype(np.float32)
        qs = (rng.random((16, 40)) * 4 - 2).astype(np.float32)
        from petal_neighbors_tpu.distance import Cosine
        idx = BruteForce(pts, Cosine())        # kernel mode resident
        assert idx._cosine_kernel

        def boom(*a, **kw):
            raise RuntimeError("forced")

        monkeypatch.setattr(bf, "knn_pallas_prepadded", boom)
        bf._fallback_warned = True             # silence, tested elsewhere
        d_xla, i_xla = idx.query_batch(qs, 5)  # falls back
        assert idx.last_backend == "xla"
        od, oi = self._oracle(pts, qs, 5)
        for r in range(len(qs)):
            assert set(np.asarray(i_xla)[r].tolist()) == set(oi[r].tolist())
        np.testing.assert_allclose(np.asarray(d_xla), od, atol=2e-6)


class TestLowDimKernelMode:
    """Round-5: the Euclidean kernel branch takes ANY dim at n >= 4096
    (the per-call bf.knn gate still keeps low dim on the direct XLA
    form — only the plane-persisting index routes low dim through the
    kernel).  Wiring + exactness in interpret mode."""

    def test_low_dim_index_builds_kernel_arrays_and_is_exact(
            self, rng, monkeypatch):
        from functools import partial
        import petal_neighbors_tpu.ops.pallas.knn_kernel as kk
        monkeypatch.setattr(kk, "pallas_available", lambda: True)
        monkeypatch.setattr(
            bf, "knn_pallas_prepadded",
            partial(bf.knn_pallas_prepadded.__wrapped__, interpret=True))
        pts = (rng.random((5000, 2)) * 10 + 5).astype(np.float32)
        pts[17] = np.nan
        qs = (rng.random((48, 2)) * 10 + 5).astype(np.float32)
        idx = BruteForce.euclidean(pts)
        assert idx._pallas_pts is not None          # kernel-mode resident
        d, i = idx.query_batch(qs, 8)
        assert idx.last_backend == "pallas"
        i = np.asarray(i)
        assert not (i == 17).any()                  # NaN row never matches
        dd = ((pts[None].astype(np.float64)
               - qs[:, None].astype(np.float64)) ** 2).sum(-1)
        dd = np.where(np.isnan(dd), np.inf, dd)
        oi = np.argsort(dd, 1, kind="stable")[:, :8]
        for r in range(len(qs)):
            assert set(i[r].tolist()) == set(oi[r].tolist()), r
        np.testing.assert_allclose(
            np.asarray(d), np.sqrt(np.take_along_axis(dd, oi, 1)),
            rtol=1e-5, atol=1e-5)

    def test_small_or_f64_corpus_stays_on_xla(self, rng, monkeypatch):
        import petal_neighbors_tpu.ops.pallas.knn_kernel as kk
        monkeypatch.setattr(kk, "pallas_available", lambda: True)
        small = BruteForce.euclidean(
            rng.random((100, 2)).astype(np.float32))
        assert small._pallas_pts is None
        f64 = BruteForce.euclidean(rng.random((5000, 2)))
        assert f64._pallas_pts is None


class TestKernelModeXlaFallbackNaN:
    """Regression (review finding): the kernel-mode index's resident
    copy zeroes NaN rows (+inf norms).  The XLA fallback must not
    resurrect them — neither by recomputing norms when the chunk pads
    the corpus, nor through the rescore."""

    def _kernel_mode_index(self, rng, monkeypatch):
        import petal_neighbors_tpu.ops.pallas.knn_kernel as kk
        monkeypatch.setattr(kk, "pallas_available", lambda: True)
        pts = rng.standard_normal((5000, 200)).astype(np.float32)
        pts[7] = np.nan
        pts[11, 3] = np.nan
        idx = BruteForce.euclidean(pts)
        assert idx._pallas_pts is not None      # kernel-resident layout
        return pts, idx

    def test_fallback_never_returns_nan_rows(self, rng, monkeypatch):
        pts, idx = self._kernel_mode_index(rng, monkeypatch)

        def boom(*a, **kw):
            raise RuntimeError("forced")

        monkeypatch.setattr(bf, "knn_pallas_prepadded", boom)
        bf._fallback_warned = True
        qs = pts[100:132].copy()
        # chunk=4096 does NOT divide 5000: the padded-norms path
        d, i = idx.query_batch(qs, 5, chunk=4096)
        assert idx.last_backend == "xla"
        i = np.asarray(i)
        assert not np.isin(i, [7, 11]).any()
        # nearest neighbor of each query is itself at distance ~0
        np.testing.assert_allclose(np.asarray(d)[:, 0], 0.0, atol=1e-3)

    def test_invalid_rows_stay_out_even_at_k_near_n(self, rng, monkeypatch):
        """k > finite-candidate count: invalid rows must surface as
        (-1, inf), not as rescored zeroed rows."""
        import petal_neighbors_tpu.ops.pallas.knn_kernel as kk
        monkeypatch.setattr(kk, "pallas_available", lambda: True)
        pts = rng.standard_normal((4400, 200)).astype(np.float32)
        pts[:3] = np.nan
        idx = BruteForce.euclidean(pts)

        def boom(*a, **kw):
            raise RuntimeError("forced")

        monkeypatch.setattr(bf, "knn_pallas_prepadded", boom)
        bf._fallback_warned = True
        d, i = idx.query_batch(pts[50:52].copy(), 4400, chunk=4096)
        i = np.asarray(i); d = np.asarray(d)
        assert not np.isin(i, [0, 1, 2]).any()
        assert (i[:, -3:] == -1).all() and np.isinf(d[:, -3:]).all()


class TestStreamingRadiusOps:
    """radius_capped / radius_counts_streaming vs the dense mask oracle
    (both new in round 3 — the mask-free memory discipline path)."""

    def test_capped_matches_mask(self, rng):
        from petal_neighbors_tpu.ops import bruteforce as bf
        pts = rng.standard_normal((300, 6)).astype(np.float32)
        qs = rng.standard_normal((23, 6)).astype(np.float32)
        for inclusive in (True, False):
            mask = np.asarray(bf.radius_mask(pts, qs, 2.0,
                                             inclusive=inclusive))
            ids, cnt = bf.radius_capped(pts, qs, 2.0, cap=300,
                                        inclusive=inclusive, chunk=64)
            ids, cnt = np.asarray(ids), np.asarray(cnt)
            np.testing.assert_array_equal(cnt, mask.sum(1))
            for row in range(len(qs)):
                got = ids[row][ids[row] >= 0]
                np.testing.assert_array_equal(got, np.flatnonzero(mask[row]))
                # ascending id order contract
                assert (np.diff(got) > 0).all()

    def test_counts_streaming_matches_mask(self, rng):
        from petal_neighbors_tpu.ops import bruteforce as bf
        pts = rng.standard_normal((257, 4)).astype(np.float32)
        qs = rng.standard_normal((9, 4)).astype(np.float32)
        mask = np.asarray(bf.radius_mask(pts, qs, 1.5))
        cnt = np.asarray(bf.radius_counts_streaming(pts, qs, 1.5, chunk=50))
        np.testing.assert_array_equal(cnt, mask.sum(1))

    def test_cap_truncation_keeps_exact_counts(self, rng):
        from petal_neighbors_tpu.ops import bruteforce as bf
        pts = rng.standard_normal((200, 3)).astype(np.float32)
        qs = pts[:5]
        mask = np.asarray(bf.radius_mask(pts, qs, 3.0))
        ids, cnt = bf.radius_capped(pts, qs, 3.0, cap=4, chunk=32)
        ids, cnt = np.asarray(ids), np.asarray(cnt)
        np.testing.assert_array_equal(cnt, mask.sum(1))       # exact past cap
        for row in range(5):
            want = np.flatnonzero(mask[row])[:4]
            got = ids[row][ids[row] >= 0]
            np.testing.assert_array_equal(got, want)          # first-4 by id

    def test_nan_and_invalid_rows_never_match(self, rng):
        from petal_neighbors_tpu.ops import bruteforce as bf
        pts = rng.standard_normal((64, 3)).astype(np.float32)
        import jax.numpy as jnp
        pts[7] = np.nan
        invalid = np.zeros(64, bool); invalid[12] = True
        qs = pts[:3]
        ids, cnt = bf.radius_capped(pts, qs, 10.0, cap=64,
                                    invalid=jnp.asarray(invalid), chunk=16)
        ids = np.asarray(ids)
        assert not np.isin([7, 12], ids[ids >= 0]).any()

    def test_distances_at(self, rng):
        from petal_neighbors_tpu.ops import bruteforce as bf
        from petal_neighbors_tpu.distance import Euclidean, Manhattan
        pts = rng.standard_normal((90, 5)).astype(np.float32)
        qs = rng.standard_normal((11, 5)).astype(np.float32)
        import jax.numpy as jnp
        ids = rng.integers(0, 90, (11, 6)).astype(np.int32)
        ids[0, 2] = -1
        for metric in (Euclidean(), Manhattan()):
            d = np.asarray(bf.distances_at(pts, qs, jnp.asarray(ids),
                                           metric))
            for row in range(11):
                for col in range(6):
                    j = ids[row, col]
                    if j < 0:
                        assert d[row, col] == np.inf
                    else:
                        want = float(metric.distance(qs[row], pts[j]))
                        assert d[row, col] == pytest.approx(want, rel=1e-5)


class TestInvalidQueryPolicy:
    """XLA paths now mirror the fused kernel's (+inf, -1) policy for
    queries whose distance to EVERY point is NaN (round-2 advisor:
    zero-norm cosine queries returned arbitrary real ids by backend)."""

    def test_nan_query_euclidean_xla(self, rng):
        from petal_neighbors_tpu.ops import bruteforce as bf
        pts = rng.standard_normal((50, 4)).astype(np.float32)
        qs = rng.standard_normal((3, 4)).astype(np.float32)
        qs[1, 2] = np.nan
        d, i = bf.knn(pts, qs, 5, backend="xla")
        d, i = np.asarray(d), np.asarray(i)
        assert (i[1] == -1).all() and (d[1] == np.inf).all()
        assert (i[0] >= 0).all() and (i[2] >= 0).all()

    def test_zero_norm_cosine_matches_kernel_policy(self, rng):
        from petal_neighbors_tpu.distance import Cosine
        from petal_neighbors_tpu.ops import bruteforce as bf
        pts = rng.standard_normal((40, 8)).astype(np.float32)
        qs = rng.standard_normal((3, 8)).astype(np.float32)
        qs[0] = 0.0                                  # zero norm: 0/0 -> NaN
        d, i = bf.knn(pts, qs, 4, Cosine(), backend="xla")
        d, i = np.asarray(d), np.asarray(i)
        assert (i[0] == -1).all() and (d[0] == np.inf).all()
        assert (i[1:] >= 0).all()


class TestLpKernelIntegration:
    """Round-3 generic-metric fused path: BruteForce with Minkowski /
    Manhattan / Chebyshev at high dim routes through the Lp Pallas
    kernel (interpret mode on CPU) and stays exact vs the XLA path."""

    @pytest.mark.parametrize("metric", ["minkowski3", "manhattan",
                                        "chebyshev"])
    def test_exact_vs_xla(self, rng, metric, monkeypatch):
        from petal_neighbors_tpu import BruteForce
        from petal_neighbors_tpu.distance import (Chebyshev, Manhattan,
                                                  Minkowski)
        from petal_neighbors_tpu.ops import bruteforce as bf
        from petal_neighbors_tpu.ops.pallas import knn_kernel
        m = {"minkowski3": Minkowski(3.0), "manhattan": Manhattan(),
             "chebyshev": Chebyshev()}[metric]
        monkeypatch.setattr(knn_kernel, "pallas_available", lambda: True)
        monkeypatch.setattr(bf, "FORCE_INTERPRET", True)
        pts = rng.standard_normal((4608, 48)).astype(np.float32)
        pts[11] = np.nan
        qs = rng.standard_normal((40, 48)).astype(np.float32)
        idx = BruteForce(pts, m)
        assert idx._lp_spec is not None
        d_k, i_k = idx.query_batch(qs, 7)
        assert idx.last_backend == "pallas"
        d_x, i_x = bf.knn(pts, qs, 7, m, backend="xla")
        np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_x),
                                   rtol=1e-5, atol=1e-5)
        fin = np.isfinite(np.asarray(d_x))
        assert (np.asarray(i_k) == np.asarray(i_x))[fin].mean() > 0.99

    def test_radius_paths_still_exact_in_lp_mode(self, rng, monkeypatch):
        from petal_neighbors_tpu import BruteForce
        from petal_neighbors_tpu.distance import Minkowski
        from petal_neighbors_tpu.ops.pallas import knn_kernel
        monkeypatch.setattr(knn_kernel, "pallas_available", lambda: True)
        pts = rng.standard_normal((4608, 40)).astype(np.float32)
        pts[3] = np.nan
        idx = BruteForce(pts, Minkowski(3.0))
        qs = pts[5:8]
        ids = idx.query_radius(qs[0], 10.0)
        diff = np.abs(qs[0].astype(np.float64) - pts.astype(np.float64))
        d = (diff ** 3).sum(-1) ** (1 / 3)
        want = np.flatnonzero(np.where(np.isnan(d), np.inf, d) <= 10.0)
        np.testing.assert_array_equal(ids, want)
