"""Pallas fused k-NN kernel tests, run in interpret mode on CPU (the
kernel logic is backend-independent; compiled-mode behavior is exercised
by bench.py / the verify drive on the real TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from petal_neighbors_tpu.ops.bruteforce import pad_for_pallas
from petal_neighbors_tpu.ops.pallas.knn_kernel import knn_pallas


def oracle(points, queries, k):
    d = ((queries[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def run_kernel(pts, qs, k, *, tq=128, tn=512, **kw):
    pp, pn = pad_for_pallas(jnp.asarray(pts), tn=tn)
    rd, i = knn_pallas(pp, jnp.asarray(qs), pn, k=k, tq=tq, tn=tn,
                       interpret=True, **kw)
    return np.asarray(rd), np.asarray(i)


@pytest.mark.parametrize("n,q,k", [(512, 128, 10), (1024, 128, 4)])
def test_kernel_matches_oracle(rng, n, q, k):
    d = 64
    pts = rng.random((n, d)).astype(np.float32) * 100
    qs = rng.random((q, d)).astype(np.float32) * 100
    rd, i = run_kernel(pts, qs, k)
    od, oi = oracle(pts.astype(np.float64), qs.astype(np.float64), k)
    for r in range(q):
        assert set(i[r].tolist()) == set(oi[r].tolist()), r
    assert (np.diff(rd, axis=1) >= 0).all()
    np.testing.assert_allclose(rd, od, rtol=2e-4)


def test_kernel_nan_rows_never_selected(rng):
    n, q, d, k = 512, 128, 64, 5
    pts = rng.random((n, d)).astype(np.float32)
    pts[7] = np.nan          # a NaN point: farthest, never in top-5 of 512
    pts[9, 3] = np.nan       # partial-NaN row: same policy
    qs = rng.random((q, d)).astype(np.float32)
    _, i = run_kernel(pts, qs, k)
    assert not np.isin(i, [7, 9]).any()


def test_kernel_unpadded_tail(rng):
    """n not a tile multiple: pad_for_pallas pads with +inf norms, which
    must never be selected nor break extraction."""
    n, q, d, k = 700, 128, 64, 10
    pts = rng.random((n, d)).astype(np.float32)
    qs = rng.random((q, d)).astype(np.float32)
    rd, i = run_kernel(pts, qs, k)
    assert (i < n).all() and (i >= 0).all()
    od, oi = oracle(pts.astype(np.float64), qs.astype(np.float64), k)
    for r in range(q):
        assert set(i[r].tolist()) == set(oi[r].tolist()), r


@pytest.mark.parametrize("k", [4, 40, 100])
def test_subtiled_kernel_matches_oracle(rng, k):
    n, q, d = 1024, 128, 64
    pts = rng.random((n, d)).astype(np.float32) * 100
    qs = rng.random((q, d)).astype(np.float32) * 100
    rd, i = run_kernel(pts, qs, k, subtile=128)
    od, oi = oracle(pts.astype(np.float64), qs.astype(np.float64), k)
    for r in range(q):
        assert set(i[r].tolist()) == set(oi[r].tolist()), r
    assert (np.diff(rd, axis=1) >= 0).all()
    np.testing.assert_allclose(rd, od, rtol=2e-4)


def test_subtiled_kernel_with_ties(rng):
    # duplicated rows force equal distances inside one sub-tile: each
    # must be extracted exactly once (mask-then-re-min, no duplicates)
    n, q, d, k = 512, 128, 64, 20
    pts = rng.random((n, d)).astype(np.float32)
    pts[100:140] = pts[100]          # 40 identical points
    qs = pts[:q] + 0.01
    _, i = run_kernel(pts, qs, k, subtile=128)
    for r in range(q):
        assert len(set(i[r].tolist())) == k  # no duplicates, no -1 gaps


def test_nan_query_rows_stay_empty(rng):
    n, q, d, k = 512, 128, 64, 5
    pts = rng.random((n, d)).astype(np.float32)
    qs = rng.random((q, d)).astype(np.float32)
    qs[3] = np.nan
    rd, i = run_kernel(pts, qs, k)
    # raw kernel: never selects anything for a NaN query (distances stay
    # non-finite); the public path's rescore masks these to (+inf, -1)
    assert (i[3] == -1).all() and not np.isfinite(rd[3]).any()
    assert (i[4] >= 0).all()         # neighbors unaffected


def test_unsorted_output_same_working_set(rng):
    """sort_output=False must return the same candidate SET (and the same
    max — the proof threshold) as the sorted path."""
    n, q, d, k = 1024, 128, 64, 37
    pts = rng.random((n, d)).astype(np.float32) * 100
    qs = rng.random((q, d)).astype(np.float32) * 100
    rd_s, i_s = run_kernel(pts, qs, k)
    rd_u, i_u = run_kernel(pts, qs, k, sort_output=False)
    for r in range(q):
        assert set(i_u[r].tolist()) == set(i_s[r].tolist()), r
    np.testing.assert_allclose(np.max(rd_u, axis=1), rd_s[:, -1], rtol=1e-6)


@pytest.mark.parametrize("k", [300, 520])
def test_large_k_matches_oracle(rng, k):
    """k beyond the old 256 cap (working set up to 1024)."""
    n, q, d = 1024, 32, 64
    pts = rng.random((n, d)).astype(np.float32) * 100
    qs = rng.random((q, d)).astype(np.float32) * 100
    rd, i = run_kernel(pts, qs, k, tq=32, sort_output=False)
    od, oi = oracle(pts.astype(np.float64), qs.astype(np.float64), k)
    for r in range(q):
        assert set(i[r].tolist()) == set(oi[r].tolist()), r


def test_prepadded_large_k_exact(rng):
    """End-to-end serving path at k > 248 (the old fallback threshold)."""
    from petal_neighbors_tpu.ops.bruteforce import (
        center_of, knn_pallas_prepadded, pad_for_pallas)
    n, q, d, k = 1024, 32, 64, 300
    pts = (rng.random((n, d)) * 10 + 50).astype(np.float32)
    qs = (rng.random((q, d)) * 10 + 50).astype(np.float32)
    mu = center_of(jnp.asarray(pts))
    pp, pn = pad_for_pallas(jnp.asarray(pts) - mu, tn=512)
    dd, ii = knn_pallas_prepadded(pp, pn, jnp.asarray(qs), k, n,
                                  center=mu, precision="high",
                                  tq=32, tn=512, interpret=True)
    od, oi = oracle(pts.astype(np.float64), qs.astype(np.float64), k)
    ii = np.asarray(ii)
    for r in range(q):
        assert set(ii[r].tolist()) == set(oi[r].tolist()), r
    assert (np.diff(np.asarray(dd), axis=1) >= 0).all()


@pytest.mark.parametrize("precision", ["high", "bf16"])
def test_reduced_precision_candidates(rng, precision):
    """Reduced-precision score passes must still produce a candidate set
    whose rescored top-k is exact on well-conditioned data (the public
    path additionally proves coverage per batch)."""
    n, q, d, k = 1024, 128, 64, 10
    pts = rng.random((n, d)).astype(np.float32)
    qs = rng.random((q, d)).astype(np.float32)
    rd, i = run_kernel(pts, qs, k + 8, precision=precision)
    od, oi = oracle(pts.astype(np.float64), qs.astype(np.float64), k)
    # every true top-k id appears in the top-(k+8) candidates
    hit = np.array([np.isin(oi[r], i[r]).all() for r in range(q)])
    assert hit.all()


@pytest.mark.parametrize("precision", ["highest", "high", "bf16"])
def test_prepadded_proof_path_exact(rng, precision):
    """knn_pallas_prepadded end-to-end (interpret mode): the candidate
    pass at any precision + coverage proof + rescore must be exact."""
    from petal_neighbors_tpu.ops.bruteforce import (
        center_of, knn_pallas_prepadded, pad_for_pallas)
    n, q, d, k = 1024, 100, 64, 10
    pts = (rng.random((n, d)) * 10 + 50).astype(np.float32)
    qs = (rng.random((q, d)) * 10 + 50).astype(np.float32)
    mu = center_of(jnp.asarray(pts))
    pp, pn = pad_for_pallas(jnp.asarray(pts) - mu, tn=512)
    dd, ii = knn_pallas_prepadded(pp, pn, jnp.asarray(qs), k, n,
                                  center=mu, precision=precision,
                                  tn=512, interpret=True)
    od, oi = oracle(pts.astype(np.float64), qs.astype(np.float64), k)
    ii = np.asarray(ii)
    for r in range(q):
        assert set(ii[r].tolist()) == set(oi[r].tolist()), r
    np.testing.assert_allclose(np.asarray(dd) ** 2, od, rtol=2e-4)


class TestMergeScheme:
    """Round-3 batch-merge kernel: sorted working set + W-slot buffer +
    bitonic merge (interpret mode; TPU perf covered by benchmarks)."""

    @pytest.mark.parametrize("n,d,q,k,tn,tq,W,sub", [
        (4096, 32, 64, 10, 1024, 8, 4, 1024),
        (8192, 16, 64, 100, 2048, 16, 16, 2048),
        (4096, 8, 64, 1, 1024, 8, 8, 1024),
        (8192, 16, 32, 1500, 2048, 8, 16, 2048),   # k > fold ceiling
        (8192, 16, 64, 37, 2048, 8, 16, 512),      # subtile split
    ])
    def test_exact_vs_oracle(self, rng, n, d, q, k, tn, tq, W, sub):
        from petal_neighbors_tpu.ops.bruteforce import pad_for_pallas
        from petal_neighbors_tpu.ops.pallas.knn_kernel import knn_pallas
        pts = rng.standard_normal((n, d)).astype(np.float32)
        pts[7] = np.nan
        qs = rng.standard_normal((q, d)).astype(np.float32)
        qs[3] = np.nan
        pp, pn = pad_for_pallas(jnp.asarray(pts), tn=tn)
        rd, ii = knn_pallas(pp, jnp.asarray(qs), pn, k=k, tq=tq, tn=tn,
                            interpret=True, scheme="merge", buf_w=W,
                            subtile=sub)
        rd, ii = np.asarray(rd), np.asarray(ii)
        d2 = ((qs[:, None].astype(np.float64)
               - pts[None].astype(np.float64)) ** 2).sum(-1)
        d2 = np.where(np.isnan(d2), np.inf, d2)
        oi = np.argsort(d2, axis=1, kind="stable")[:, :k]
        od = np.take_along_axis(d2, oi, 1)
        for r in range(q):
            if np.isnan(qs[r]).any():
                assert (ii[r] == -1).all()       # kernel NaN-query policy
                continue
            fin = od[r] < np.inf
            np.testing.assert_allclose(rd[r][fin], od[r][fin],
                                       rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(np.sort(d2[r][ii[r][fin]]),
                                       od[r][fin], rtol=1e-4, atol=1e-3)
            assert (np.diff(rd[r][fin]) >= -1e-3).all()   # sorted output

    def test_prepadded_large_k_end_to_end(self, rng):
        """k > 1016 rides the fused path via the merge scheme (round-2
        judge item #8) — recall 1.0 vs f64 oracle."""
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q, k = 8192, 64, 16, 1200
        pts = rng.standard_normal((n, d)).astype(np.float32)
        qs = rng.standard_normal((q, d)).astype(np.float32)
        mu = bf.center_of(pts)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts) - mu, tn=2048)
        dd, ii = bf.knn_pallas_prepadded(pp, pn, jnp.asarray(qs), k, n,
                                         mu, precision="high", tn=2048,
                                         interpret=True)
        dd, ii = np.asarray(dd), np.asarray(ii)
        d2 = np.sqrt((((qs[:, None].astype(np.float64)
                        - pts[None].astype(np.float64)) ** 2).sum(-1)))
        oi = np.argsort(d2, 1)[:, :k]
        od = np.take_along_axis(d2, oi, 1)
        np.testing.assert_allclose(dd, od, rtol=1e-4, atol=1e-4)
        assert np.mean([len(set(ii[r]) & set(oi[r])) / k
                        for r in range(q)]) == 1.0


class TestTwoPhaseScheme:
    """Round-3 small-k redesign: control-flow-free subchunk-minima kernel
    + exact direct-form candidate rescore (see BENCH_NOTES round 3 —
    the fold kernel's while_loop costs 2.7x in lost pipelining)."""

    def test_exact_vs_oracle(self, rng):
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q, k = 65536, 64, 48, 10
        pts = rng.standard_normal((n, d)).astype(np.float32)
        pts[5] = np.nan
        qs = rng.standard_normal((q, d)).astype(np.float32)
        qs[3] = np.nan
        mu = bf.center_of(pts)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts) - mu, tn=4096)
        dd, ii = bf.knn_pallas_prepadded(pp, pn, jnp.asarray(qs), k, n,
                                         mu, precision="high", tn=4096,
                                         interpret=True,
                                         scheme="two_phase")
        dd, ii = np.asarray(dd), np.asarray(ii)
        d2 = np.sqrt((((qs[:, None].astype(np.float64)
                        - pts[None].astype(np.float64)) ** 2).sum(-1)))
        d2 = np.where(np.isnan(d2), np.inf, d2)
        oi = np.argsort(d2, 1, kind="stable")[:, :k]
        od = np.take_along_axis(d2, oi, 1)
        for r in range(q):
            if np.isnan(qs[r]).any():
                assert (ii[r] == -1).all() and (dd[r] == np.inf).all()
                continue
            np.testing.assert_allclose(dd[r], od[r], rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.sort(d2[r][ii[r]]), od[r],
                                       rtol=1e-4, atol=1e-4)

    def test_subchunk_minima_values(self, rng):
        from petal_neighbors_tpu.ops.bruteforce import pad_for_pallas
        from petal_neighbors_tpu.ops.pallas.knn_kernel import (
            SUBCHUNK, subchunk_minima)
        n, d, q = 8192, 32, 16
        pts = rng.standard_normal((n, d)).astype(np.float32)
        qs = rng.standard_normal((q, d)).astype(np.float32)
        pp, pn = pad_for_pallas(jnp.asarray(pts), tn=2048)
        m = np.asarray(subchunk_minima(pp, jnp.asarray(qs), pn, tq=8,
                                       tn=2048, precision="highest",
                                       interpret=True))
        qn = (qs.astype(np.float64) ** 2).sum(-1)
        d2 = (((qs[:, None].astype(np.float64)
                - pts[None].astype(np.float64)) ** 2).sum(-1))
        u = d2 - qn[:, None]
        want = u.reshape(q, n // SUBCHUNK, SUBCHUNK).min(-1)
        np.testing.assert_allclose(m, want, rtol=1e-4, atol=1e-3)


class TestCappedScheme:
    """Round-3 capped-pass kernel: fixed unconditional extraction passes
    per tile (no data-dependent control flow — pipelines like the floor
    probe) + the miss-threshold proof in knn_pallas_prepadded."""

    @pytest.mark.parametrize("passes", [1, 2, 4])
    def test_end_to_end_exact(self, rng, passes):
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q, k = 8192, 32, 96, 10
        pts = rng.standard_normal((n, d)).astype(np.float32)
        pts[7] = np.nan
        qs = rng.standard_normal((q, d)).astype(np.float32)
        qs[3] = np.nan
        mu = bf.center_of(pts)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts) - mu, tn=512)
        dd, ii = bf.knn_pallas_prepadded(pp, pn, jnp.asarray(qs), k, n,
                                         mu, precision="high", tn=512,
                                         interpret=True, scheme="capped")
        dd, ii = np.asarray(dd), np.asarray(ii)
        d2 = np.sqrt((((qs[:, None].astype(np.float64)
                        - pts[None].astype(np.float64)) ** 2).sum(-1)))
        d2 = np.where(np.isnan(d2), np.inf, d2)
        oi = np.argsort(d2, 1, kind="stable")[:, :k]
        od = np.take_along_axis(d2, oi, 1)
        for r in range(q):
            if np.isnan(qs[r]).any():
                assert (ii[r] == -1).all() and (dd[r] == np.inf).all()
                continue
            np.testing.assert_allclose(dd[r], od[r], rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.sort(d2[r][ii[r]]), od[r],
                                       rtol=1e-4, atol=1e-4)

    def test_threshold_is_sound(self, rng):
        """Every point OUTSIDE the kernel's working set must score >= thr
        (the exactness argument; holds even when passes is too small and
        true top-k members were skipped)."""
        n, d, q, k = 4096, 16, 32, 12
        pts = (rng.random((n, d)).astype(np.float32) - 0.5) * 10
        qs = (rng.random((q, d)).astype(np.float32) - 0.5) * 10
        pp, pn = pad_for_pallas(jnp.asarray(pts), tn=512)
        rd, ii, thr = knn_pallas(pp, jnp.asarray(qs), pn, k=k, tq=32,
                                 tn=512, interpret=True,
                                 precision="highest", scheme="capped",
                                 passes=1)
        rd, ii, thr = np.asarray(rd), np.asarray(ii), np.asarray(thr)
        d2 = (((qs[:, None].astype(np.float64)
                - pts[None].astype(np.float64)) ** 2).sum(-1))
        slack = 1e-3  # f32 rounding on the matmul-form scores
        for r in range(q):
            inside = set(int(x) for x in ii[r] if x >= 0)
            outside = [j for j in range(n) if j not in inside]
            assert d2[r][outside].min() >= thr[r] - slack, r

    def test_adversarial_identical_points_fall_back(self, rng):
        """All-equal points: every tile overflows the pass cap, the proof
        cannot certify, and the fold fallback must still deliver exact
        results."""
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q, k = 4096, 8, 16, 5
        pts = np.ones((n, d), dtype=np.float32)
        qs = rng.standard_normal((q, d)).astype(np.float32)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts), tn=512)
        dd, ii = bf.knn_pallas_prepadded(pp, pn, jnp.asarray(qs), k, n,
                                         precision="high", tn=512,
                                         interpret=True, scheme="capped")
        want = np.sqrt(((qs - 1.0) ** 2).sum(-1))
        np.testing.assert_allclose(np.asarray(dd),
                                   np.repeat(want[:, None], k, 1),
                                   rtol=1e-5, atol=1e-5)
        assert (np.sort(np.asarray(ii), 1) >= 0).all()

    def test_k_greater_than_n_real(self, rng):
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q = 20, 8, 16
        pts = rng.standard_normal((n, d)).astype(np.float32)
        qs = rng.standard_normal((q, d)).astype(np.float32)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts), tn=512)
        dd, ii = bf.knn_pallas_prepadded(pp, pn, jnp.asarray(qs), 10, n,
                                         precision="highest", tn=512,
                                         interpret=True, scheme="capped")
        d2 = (((qs[:, None].astype(np.float64)
                - pts[None].astype(np.float64)) ** 2).sum(-1))
        oi = np.argsort(d2, 1, kind="stable")[:, :10]
        assert (np.asarray(ii) == oi).all()


class TestCappedLargeK:
    """Round-3 large-k extension: the capped scheme's pass budget scales
    with the expected per-tile survivor count, and k_scan >= 512 re-ranks
    through the chunked direct-form rescore + Pallas bitonic sort
    (_rescore_large) instead of the (Q, k_scan, d) blob + TopK."""

    def test_large_k_end_to_end_exact(self, rng):
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q, k = 4096, 16, 32, 600
        pts = rng.standard_normal((n, d)).astype(np.float32)
        qs = rng.standard_normal((q, d)).astype(np.float32)
        qs[5] = np.nan
        mu = bf.center_of(pts)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts) - mu, tn=1024)
        dd, ii = bf.knn_pallas_prepadded(pp, pn, jnp.asarray(qs), k, n,
                                         mu, precision="high", tn=1024,
                                         interpret=True, scheme="capped")
        dd, ii = np.asarray(dd), np.asarray(ii)
        dist = np.sqrt((((qs[:, None].astype(np.float64)
                          - pts[None].astype(np.float64)) ** 2).sum(-1)))
        dist = np.where(np.isnan(dist), np.inf, dist)
        oi = np.argsort(dist, 1, kind="stable")[:, :k]
        od = np.take_along_axis(dist, oi, 1)
        for r in range(q):
            if np.isnan(qs[r]).any():
                assert (ii[r] == -1).all() and (dd[r] == np.inf).all()
                continue
            np.testing.assert_allclose(dd[r], od[r], rtol=1e-4, atol=1e-4)
            assert set(ii[r].tolist()) == set(oi[r].tolist()), r
        assert (np.diff(dd[~np.isnan(qs).any(1)], axis=1) >= 0).all()

    def test_rescore_large_matches_rescore_exact(self, rng):
        from petal_neighbors_tpu.ops.bruteforce import _rescore_large
        from petal_neighbors_tpu.ops.topk import rescore_exact
        n, d, q, k_in, k = 500, 24, 70, 40, 25
        pts = rng.standard_normal((n, d)).astype(np.float32)
        qs = rng.standard_normal((q, d)).astype(np.float32)
        idx = rng.integers(-1, n, size=(q, k_in)).astype(np.int32)
        rd_a, i_a = _rescore_large(jnp.asarray(pts), jnp.asarray(qs),
                                   jnp.asarray(idx), k, True)
        rd_b, i_b = rescore_exact(jnp.asarray(pts), jnp.asarray(qs),
                                  jnp.asarray(idx), k)
        np.testing.assert_allclose(np.asarray(rd_a), np.asarray(rd_b),
                                   rtol=1e-6, atol=1e-6)
        # id sets must agree wherever distances are distinct; compare
        # via distances to stay tie-robust
        d_at_a = np.asarray(rd_a)
        d_at_b = np.asarray(rd_b)
        np.testing.assert_allclose(d_at_a, d_at_b, rtol=1e-6, atol=1e-6)


class TestBcapScheme:
    """Round-4 block-capped kernel: capped extraction on per-block
    minima over the block-interleaved planes (prepare_bcap_planes); each
    returned block id expands to ``tn/128`` contiguous corpus rows for
    the slab rescore, and the same miss-threshold proof + compacted
    repair guard exactness (knn_pallas_prepadded scheme='bcap')."""

    def _planes(self, pp, pn, tn, precision):
        from petal_neighbors_tpu.ops.pallas.knn_kernel import (
            prepare_bcap_planes)
        return prepare_bcap_planes(pp, pn, tn=tn, precision=precision)

    @pytest.mark.parametrize("precision", ["high", "highest"])
    @pytest.mark.parametrize("passes", [1, 2, 4])
    def test_end_to_end_exact(self, rng, precision, passes):
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q, k = 8192, 32, 96, 10
        pts = rng.standard_normal((n, d)).astype(np.float32)
        pts[7] = np.nan
        qs = rng.standard_normal((q, d)).astype(np.float32)
        qs[3] = np.nan
        mu = bf.center_of(pts)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts) - mu, tn=512)
        planes = self._planes(pp, pn, 512, precision)
        dd, ii = bf.knn_pallas_prepadded(
            pp, pn, jnp.asarray(qs), k, n, mu, precision=precision,
            tn=512, interpret=True, scheme="bcap", bcap_planes=planes,
            capped_passes=passes)
        dd, ii = np.asarray(dd), np.asarray(ii)
        d2 = np.sqrt((((qs[:, None].astype(np.float64)
                        - pts[None].astype(np.float64)) ** 2).sum(-1)))
        d2 = np.where(np.isnan(d2), np.inf, d2)
        oi = np.argsort(d2, 1, kind="stable")[:, :k]
        od = np.take_along_axis(d2, oi, 1)
        for r in range(q):
            if np.isnan(qs[r]).any():
                assert (ii[r] == -1).all() and (dd[r] == np.inf).all()
                continue
            np.testing.assert_allclose(dd[r], od[r], rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.sort(d2[r][ii[r]]), od[r],
                                       rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("groups", [2, 4])
    @pytest.mark.parametrize("k", [10, 40])
    def test_multi_group_tile_exact(self, rng, groups, k):
        """Round-5 granule/tile decoupling: the kernel tile spans
        ``groups`` interleave granules (one (tq, 128) lane-minima set
        each, extraction over the concat) — results must match the f64
        oracle exactly, same as the single-group layout."""
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q = 8192, 32, 96
        pts = rng.standard_normal((n, d)).astype(np.float32)
        pts[11] = np.nan
        qs = rng.standard_normal((q, d)).astype(np.float32)
        qs[5] = np.nan
        mu = bf.center_of(pts)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts) - mu, tn=512)
        planes = self._planes(pp, pn, 512, "high")
        dd, ii = bf.knn_pallas_prepadded(
            pp, pn, jnp.asarray(qs), k, n, mu, precision="high",
            tn=512, interpret=True, scheme="bcap", bcap_planes=planes,
            bcap_tn=512, bcap_tile=512 * groups)
        dd, ii = np.asarray(dd), np.asarray(ii)
        d2 = np.sqrt((((qs[:, None].astype(np.float64)
                        - pts[None].astype(np.float64)) ** 2).sum(-1)))
        d2 = np.where(np.isnan(d2), np.inf, d2)
        od = np.sort(d2, 1)[:, :k]
        for r in range(q):
            if np.isnan(qs[r]).any():
                assert (ii[r] == -1).all() and (dd[r] == np.inf).all()
                continue
            np.testing.assert_allclose(dd[r], od[r], rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.sort(d2[r][ii[r]]), od[r],
                                       rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("k", [280, 400])
    def test_large_k_bisect_compact_sort(self, rng, k):
        """Round-5 large-k bcap route (_bcap_rescore_large): exact-k-th
        bit bisection + compaction + narrow sort must match the f64
        oracle, including the tie-overflow repair path."""
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q = 8192, 16, 48
        pts = rng.standard_normal((n, d)).astype(np.float32)
        pts[3] = np.nan
        qs = rng.standard_normal((q, d)).astype(np.float32)
        qs[7] = np.nan
        mu = bf.center_of(pts)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts) - mu, tn=512)
        planes = self._planes(pp, pn, 512, "high")
        dd, ii = bf.knn_pallas_prepadded(
            pp, pn, jnp.asarray(qs), k, n, mu, precision="high",
            tn=512, interpret=True, scheme="bcap", bcap_planes=planes,
            bcap_tn=512, bcap_tile=2048, capped_passes=8)
        dd, ii = np.asarray(dd), np.asarray(ii)
        assert dd.shape == (q, k)
        d2 = np.sqrt((((qs[:, None].astype(np.float64)
                        - pts[None].astype(np.float64)) ** 2).sum(-1)))
        d2 = np.where(np.isnan(d2), np.inf, d2)
        od = np.sort(d2, 1)[:, :k]
        for r in range(q):
            if np.isnan(qs[r]).any():
                assert (ii[r] == -1).all() and (dd[r] == np.inf).all()
                continue
            np.testing.assert_allclose(dd[r], od[r], rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.sort(d2[r][ii[r]]), od[r],
                                       rtol=1e-4, atol=1e-4)

    def test_bcap_rescore_large_tie_overflow_flags(self, rng):
        """A corpus with > _BCAP_TIE_MARGIN exact ties AT the k-th value
        must set the overflow flag (the compaction may have dropped true
        members) — the covered logic then repairs those rows."""
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, block, k = 2048, 8, 4, 272
        # all points identical -> every candidate rd ties at the cutoff
        pts = np.ones((n, d), dtype=np.float32)
        qs = np.zeros((4, d), dtype=np.float32)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts), tn=512)
        kb = 312
        bix = jnp.broadcast_to(
            jnp.arange(kb, dtype=jnp.int32)[None, :], (4, kb))
        rd, ids, overflow = bf._bcap_rescore_large(
            pp, pn, jnp.asarray(qs), bix, k, block, True)
        assert bool(np.asarray(overflow).all())
        # values are still the tied distance; ids are a subset
        np.testing.assert_allclose(np.asarray(rd), d * 1.0, rtol=1e-6)

    def test_block_threshold_is_sound(self, rng):
        """Every corpus point in a block OUTSIDE the returned block set
        must score >= thr: thr lower-bounds outside BLOCK minima, and a
        block min lower-bounds every member."""
        from petal_neighbors_tpu.ops.pallas.knn_kernel import BCAP_LANES
        n, d, q, kb = 4096, 16, 32, 16
        tn = 512
        block = tn // BCAP_LANES
        pts = (rng.random((n, d)).astype(np.float32) - 0.5) * 10
        qs = (rng.random((q, d)).astype(np.float32) - 0.5) * 10
        pp, pn = pad_for_pallas(jnp.asarray(pts), tn=tn)
        p_perm, xn_perm = self._planes(pp, pn, tn, "highest")
        rd, bix, thr = knn_pallas(p_perm, jnp.asarray(qs), xn_perm, k=kb,
                                  tq=32, tn=tn, interpret=True,
                                  precision="highest", scheme="bcap",
                                  passes=1)
        bix, thr = np.asarray(bix), np.asarray(thr)
        d2 = (((qs[:, None].astype(np.float64)
                - pts[None].astype(np.float64)) ** 2).sum(-1))
        slack = 1e-3
        for r in range(q):
            inside = set()
            for b in bix[r]:
                if b >= 0:
                    inside.update(range(int(b) * block,
                                        int(b) * block + block))
            outside = [j for j in range(n) if j not in inside]
            assert d2[r][outside].min() >= thr[r] - slack, r

    def test_adversarial_identical_points_repair(self, rng):
        """All-equal corpus: every tile overflows the pass cap; the
        proof cannot certify and the repair must deliver exactness."""
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q, k = 4096, 8, 16, 5
        pts = np.ones((n, d), dtype=np.float32)
        qs = rng.standard_normal((q, d)).astype(np.float32)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts), tn=512)
        planes = self._planes(pp, pn, 512, "high")
        dd, ii = bf.knn_pallas_prepadded(
            pp, pn, jnp.asarray(qs), k, n, precision="high", tn=512,
            interpret=True, scheme="bcap", bcap_planes=planes)
        want = np.sqrt(((qs - 1.0) ** 2).sum(-1))
        np.testing.assert_allclose(np.asarray(dd),
                                   np.repeat(want[:, None], k, 1),
                                   rtol=1e-5, atol=1e-5)
        assert (np.sort(np.asarray(ii), 1) >= 0).all()

    def test_nan_heavy_corpus_with_pass_exhaustion(self, rng):
        """The covered-condition fix: NaN rows fill the seed blocks with
        +inf; with passes=1 finite block minima can be pass-exhausted
        while the working set still holds +inf — such rows must repair,
        not return inf (the old unconditional isfinite clause accepted
        them)."""
        from petal_neighbors_tpu.ops import bruteforce as bf
        # k=40 -> kb=48 working-set blocks; pts[:192] NaN makes ALL 48
        # seed blocks +inf (tn=512, B=4), and passes=1 over 8 tiles
        # extracts only 8 finite blocks = 32 rows < k -> inf k-th with a
        # FINITE thr (plenty of finite minima remain unextracted)
        n, d, q, k = 4096, 8, 16, 40
        pts = rng.standard_normal((n, d)).astype(np.float32)
        pts[:192] = np.nan
        qs = rng.standard_normal((q, d)).astype(np.float32)
        mu = bf.center_of(pts)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts) - mu, tn=512)
        planes = self._planes(pp, pn, 512, "high")
        dd, ii = bf.knn_pallas_prepadded(
            pp, pn, jnp.asarray(qs), k, n, mu, precision="high", tn=512,
            interpret=True, scheme="bcap", bcap_planes=planes,
            capped_passes=1)
        d2 = np.sqrt((((qs[:, None].astype(np.float64)
                        - pts[None].astype(np.float64)) ** 2).sum(-1)))
        d2 = np.where(np.isnan(d2), np.inf, d2)
        od = np.sort(d2, 1)[:, :k]
        np.testing.assert_allclose(np.asarray(dd), od, rtol=1e-4,
                                   atol=1e-4)
        assert (np.asarray(ii) >= 0).all()

    def test_k_greater_than_n_real(self, rng):
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q = 20, 8, 16
        pts = rng.standard_normal((n, d)).astype(np.float32)
        qs = rng.standard_normal((q, d)).astype(np.float32)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts), tn=512)
        planes = self._planes(pp, pn, 512, "highest")
        dd, ii = bf.knn_pallas_prepadded(
            pp, pn, jnp.asarray(qs), 10, n, precision="highest", tn=512,
            interpret=True, scheme="bcap", bcap_planes=planes)
        d2 = (((qs[:, None].astype(np.float64)
                - pts[None].astype(np.float64)) ** 2).sum(-1))
        oi = np.argsort(d2, 1, kind="stable")[:, :10]
        assert (np.asarray(ii) == oi).all()

    def test_planes_roundtrip_permutation(self, rng):
        """prepare_bcap_planes must place original row l*B + t of each
        chunk at permuted position t*128 + l, pre-scaled by -2."""
        from petal_neighbors_tpu.ops.pallas.knn_kernel import (
            BCAP_LANES, prepare_bcap_planes)
        tn, d = 512, 8
        B = tn // BCAP_LANES
        pts = rng.standard_normal((2 * tn, d)).astype(np.float32)
        xn = (pts * pts).sum(-1)
        v, xp = prepare_bcap_planes(jnp.asarray(pts), jnp.asarray(xn),
                                    tn=tn, precision="highest")
        v, xp = np.asarray(v), np.asarray(xp)
        for c in range(2):
            for t in range(B):
                for l in (0, 1, 63, 127):
                    src = c * tn + l * B + t
                    dst = c * tn + t * BCAP_LANES + l
                    np.testing.assert_array_equal(v[dst], -2.0 * pts[src])
                    assert xp[dst] == xn[src]


class TestBcap2Scheme:
    """Round-5 two-phase block-capped scheme ("bcap2"): phase A streams
    per-block u-minima to HBM with no cross-step state
    (knn_kernel.bcap_minima), phase B selects the kb smallest block
    minima per query (lax.top_k) and the standard slab rescore + proof
    + repair certify exactness (knn_pallas_prepadded scheme='bcap2')."""

    def _planes(self, pp, pn, tn, precision):
        from petal_neighbors_tpu.ops.pallas.knn_kernel import (
            prepare_bcap_planes)
        return prepare_bcap_planes(pp, pn, tn=tn, precision=precision)

    @pytest.mark.parametrize("precision", ["high", "highest"])
    @pytest.mark.parametrize("tile_groups", [1, 4])
    def test_end_to_end_exact(self, rng, precision, tile_groups):
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q, k = 8192, 32, 96, 10
        pts = rng.standard_normal((n, d)).astype(np.float32)
        pts[7] = np.nan
        qs = rng.standard_normal((q, d)).astype(np.float32)
        qs[3] = np.nan
        mu = bf.center_of(pts)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts) - mu, tn=512)
        planes = self._planes(pp, pn, 512, precision)
        dd, ii = bf.knn_pallas_prepadded(
            pp, pn, jnp.asarray(qs), k, n, mu, precision=precision,
            tn=512, interpret=True, scheme="bcap2", bcap_planes=planes,
            bcap_tn=512, bcap_tile=512 * tile_groups)
        dd, ii = np.asarray(dd), np.asarray(ii)
        d2 = np.sqrt((((qs[:, None].astype(np.float64)
                        - pts[None].astype(np.float64)) ** 2).sum(-1)))
        d2 = np.where(np.isnan(d2), np.inf, d2)
        oi = np.argsort(d2, 1, kind="stable")[:, :k]
        od = np.take_along_axis(d2, oi, 1)
        for r in range(q):
            if np.isnan(qs[r]).any():
                assert (ii[r] == -1).all() and (dd[r] == np.inf).all()
                continue
            np.testing.assert_allclose(dd[r], od[r], rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.sort(d2[r][ii[r]]), od[r],
                                       rtol=1e-4, atol=1e-4)

    def test_large_k_route_exact(self, rng):
        """k * block > 1024 routes through _bcap_rescore_large; results
        must match the oracle set exactly (distances incl. ties)."""
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q, k = 8192, 16, 32, 300
        pts = rng.standard_normal((n, d)).astype(np.float32)
        qs = rng.standard_normal((q, d)).astype(np.float32)
        mu = bf.center_of(pts)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts) - mu, tn=512)
        planes = self._planes(pp, pn, 512, "highest")
        dd, ii = bf.knn_pallas_prepadded(
            pp, pn, jnp.asarray(qs), k, n, mu, precision="highest",
            tn=512, interpret=True, scheme="bcap2", bcap_planes=planes,
            bcap_tn=512, bcap_tile=2048)
        d2 = np.sqrt((((qs[:, None].astype(np.float64)
                        - pts[None].astype(np.float64)) ** 2).sum(-1)))
        od = np.sort(d2, 1)[:, :k]
        np.testing.assert_allclose(np.asarray(dd), od, rtol=1e-4,
                                   atol=1e-4)

    def test_k_greater_than_n_real(self, rng):
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q = 20, 8, 16
        pts = rng.standard_normal((n, d)).astype(np.float32)
        qs = rng.standard_normal((q, d)).astype(np.float32)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts), tn=512)
        planes = self._planes(pp, pn, 512, "highest")
        dd, ii = bf.knn_pallas_prepadded(
            pp, pn, jnp.asarray(qs), 10, n, precision="highest", tn=512,
            interpret=True, scheme="bcap2", bcap_planes=planes,
            bcap_tn=512, bcap_tile=512)
        d2 = (((qs[:, None].astype(np.float64)
                - pts[None].astype(np.float64)) ** 2).sum(-1))
        oi = np.argsort(d2, 1, kind="stable")[:, :10]
        assert (np.asarray(ii) == oi).all()

    def test_degenerate_ties_force_repair_and_stay_exact(self, rng):
        """An all-identical corpus makes every block min equal to the
        k-th rescored value, so the thr - err proof cannot certify and
        the compacted repair (or full fallback) must run — results must
        still be exact (distance 0, k distinct valid ids)."""
        from petal_neighbors_tpu.ops import bruteforce as bf
        n, d, q, k = 4096, 8, 32, 5
        pts = np.broadcast_to(
            rng.standard_normal((1, d)).astype(np.float32), (n, d)).copy()
        qs = np.broadcast_to(pts[0], (q, d)).copy()
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts), tn=512)
        planes = self._planes(pp, pn, 512, "highest")
        dd, ii = bf.knn_pallas_prepadded(
            pp, pn, jnp.asarray(qs), k, n, precision="highest", tn=512,
            interpret=True, scheme="bcap2", bcap_planes=planes,
            bcap_tn=512, bcap_tile=512)
        dd, ii = np.asarray(dd), np.asarray(ii)
        assert (dd == 0).all()
        for r in range(q):
            row = ii[r]
            assert len(set(row.tolist())) == k
            assert ((row >= 0) & (row < n)).all()

    def test_minima_kernel_matches_reference(self, rng):
        """bcap_minima column c must equal the min of u over original
        rows [c*B, (c+1)*B) — checked against a NumPy reduction."""
        from petal_neighbors_tpu.ops import bruteforce as bf
        from petal_neighbors_tpu.ops.pallas.knn_kernel import (
            BCAP_LANES, bcap_minima, prepare_bcap_planes)
        n, d, q, tn = 2048, 8, 16, 512
        B = tn // BCAP_LANES
        pts = rng.standard_normal((n, d)).astype(np.float32)
        qs = rng.standard_normal((q, d)).astype(np.float32)
        pp, pn = bf.pad_for_pallas(jnp.asarray(pts), tn=tn)
        p_perm, xn_perm = prepare_bcap_planes(pp, pn, tn=tn,
                                              precision="highest")
        m = np.asarray(bcap_minima(p_perm, jnp.asarray(qs), xn_perm,
                                   tq=16, tn=2048, granule=tn,
                                   precision="highest", interpret=True))
        u = (pts * pts).sum(-1)[None, :] - 2.0 * (qs @ pts.T)
        ref = u.reshape(q, n // B, B).min(-1)
        np.testing.assert_allclose(m, ref, rtol=1e-4, atol=1e-4)


class TestBcapIndexWiring:
    """prepare_euclidean_index(with_bcap=True) must emit planes matching
    prepare_bcap_planes at the bcap tile (the serving index's resident
    copy), and BruteForce must hold them for the query path."""

    def test_prepare_index_planes_match(self, rng):
        from petal_neighbors_tpu.ops import bruteforce as bf
        from petal_neighbors_tpu.ops.pallas.knn_kernel import (
            bcap_tile_n, prepare_bcap_planes)
        pts = rng.standard_normal((3000, 40)).astype(np.float32)
        pts[17] = np.nan
        tn = bf.pad_granule(40)
        mu, ppad, pnorm, split, bad, planes = bf.prepare_euclidean_index(
            jnp.asarray(pts), tn, with_split=True, with_bcap=True)
        assert planes is not None
        want = prepare_bcap_planes(ppad, pnorm, tn=bcap_tile_n(40),
                                   precision="high")
        np.testing.assert_array_equal(np.asarray(planes[0]),
                                      np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(planes[1]),
                                      np.asarray(want[1]))
        # NaN row norms stay +inf through the permutation
        assert np.isinf(np.asarray(planes[1])).sum() \
            == np.isinf(np.asarray(pnorm)).sum()

    def test_bruteforce_small_corpus_has_no_planes(self, rng):
        from petal_neighbors_tpu import BruteForce
        pts = rng.standard_normal((5000, 64)).astype(np.float32)
        idx = BruteForce.euclidean(pts)
        assert idx._bcap_planes is None   # below the 262144 route gate


class TestSplitBf16Integrity:
    """The bf16 hi/lo split must retain ~16 mantissa bits UNDER JIT.

    Round-4 root-cause: the original arithmetic split
    (``lo = bf16(x - f32(bf16(x)))``) had its f32->bf16->f32 convert
    pair elided by XLA-on-TPU, zeroing the lo plane and silently
    degrading the "high" precision tier (and its exactness proofs) to
    bf16-scale error.  The fix reconstructs hi's f32 value through
    integer bit ops; these tests pin the split's quality and the
    runtime integrity probe.  (The elision itself only reproduces on
    the TPU backend — these CPU tests pin the algorithm; the probe in
    ``_check_split_integrity`` guards the compiled behavior at runtime.)
    """

    def test_jitted_split_reconstructs(self, rng):
        import jax
        from petal_neighbors_tpu.ops.pallas.knn_kernel import split_bf16
        x = (rng.standard_normal((64, 128)) *
             np.exp(rng.uniform(-10, 10, (64, 128)))).astype(np.float32)
        hi, lo = jax.jit(split_bf16)(x)
        assert hi.dtype == jnp.bfloat16 and lo.dtype == jnp.bfloat16
        recon = (np.asarray(hi).astype(np.float32)
                 + np.asarray(lo).astype(np.float32))
        rel = np.abs(recon - x) / np.maximum(np.abs(x), 1e-30)
        # hi: RNE bf16 (2^-8 half-ulp); lo recaptures to ~2^-16 with its
        # own half-ulp rounding
        assert rel.max() <= 2.0 ** -15, rel.max()

    def test_split_special_values(self):
        import jax
        from petal_neighbors_tpu.ops.pallas.knn_kernel import split_bf16
        x = np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-38, -1.5],
                     dtype=np.float32)
        hi, lo = jax.jit(split_bf16)(x)
        hi = np.asarray(hi).astype(np.float32)
        lo = np.asarray(lo).astype(np.float32)
        assert np.isnan(hi[2]) and np.isinf(hi[3]) and np.isinf(hi[4])
        # the ~2^-16 guarantee holds for NORMAL-range values only; 1e-38
        # sits in bf16's denormal range where lo cannot recapture the
        # residual (harmless: such values contribute ~nothing to a dot
        # against data-scale norms).  inf rows split to lo=NaN (inf-inf);
        # index points are sanitized finite, NaN query rows are already
        # the kernel's empty-result policy.
        recon = hi + lo
        for j in (0, 1, 6):
            np.testing.assert_allclose(recon[j], x[j], rtol=2.0 ** -15)
        assert abs(recon[5] - x[5]) <= 2.0 ** -8 * abs(x[5])

    def test_integrity_probe_accepts_current_split(self):
        from petal_neighbors_tpu.ops.pallas import knn_kernel as kk
        import warnings
        prev = kk._split_checked
        kk._split_checked = False
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("error")
                kk._check_split_integrity()
            assert kk._split_checked
        finally:
            kk._split_checked = prev
