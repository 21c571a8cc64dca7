"""Pallas fused k-NN kernel tests, run in interpret mode on CPU (the
kernel logic is backend-independent; compiled-mode behavior is exercised
by bench.py / the verify drive on the real TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from petal_neighbors_tpu.ops.pallas.knn_kernel import knn_pallas


def oracle(points, queries, k):
    d = ((queries[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


@pytest.mark.parametrize("n,q,k", [(512, 128, 10), (1024, 128, 4)])
def test_kernel_matches_oracle(rng, n, q, k):
    d = 64
    pts = rng.random((n, d)).astype(np.float32) * 100
    qs = rng.random((q, d)).astype(np.float32) * 100
    xn = jnp.sum(jnp.asarray(pts) ** 2, axis=-1)
    rd, i = knn_pallas(jnp.asarray(pts), jnp.asarray(qs), xn, k=k,
                       tq=128, tn=512, interpret=True)
    rd, i = np.asarray(rd), np.asarray(i)
    od, oi = oracle(pts.astype(np.float64), qs.astype(np.float64), k)
    for r in range(q):
        assert set(i[r].tolist()) == set(oi[r].tolist()), r
    assert (np.diff(rd, axis=1) >= 0).all()
    np.testing.assert_allclose(rd, od, rtol=2e-4)


def test_kernel_nan_rows_never_selected(rng):
    n, q, d, k = 512, 128, 64, 5
    pts = rng.random((n, d)).astype(np.float32)
    pts[7] = np.nan          # a NaN point: farthest, never in top-5 of 512
    qs = rng.random((q, d)).astype(np.float32)
    xn = jnp.sum(jnp.asarray(pts) ** 2, axis=-1)
    _, i = knn_pallas(jnp.asarray(pts), jnp.asarray(qs), xn, k=k,
                      tq=128, tn=512, interpret=True)
    assert not (np.asarray(i) == 7).any()


@pytest.mark.parametrize("k", [4, 40, 100])
def test_grouped_kernel_matches_oracle(rng, k):
    n, q, d = 1024, 128, 64
    pts = rng.random((n, d)).astype(np.float32) * 100
    qs = rng.random((q, d)).astype(np.float32) * 100
    xn = jnp.sum(jnp.asarray(pts) ** 2, axis=-1)
    rd, i = knn_pallas(jnp.asarray(pts), jnp.asarray(qs), xn, k=k,
                       tq=128, tn=512, interpret=True, grouped=True)
    rd, i = np.asarray(rd), np.asarray(i)
    od, oi = oracle(pts.astype(np.float64), qs.astype(np.float64), k)
    for r in range(q):
        assert set(i[r].tolist()) == set(oi[r].tolist()), r
    assert (np.diff(rd, axis=1) >= 0).all()
    np.testing.assert_allclose(rd, od, rtol=2e-4)


def test_grouped_kernel_with_ties(rng):
    # duplicated rows force equal distances inside one group: the
    # lexicographic (value, column) cache must extract each exactly once
    n, q, d, k = 512, 128, 64, 20
    pts = rng.random((n, d)).astype(np.float32)
    pts[100:140] = pts[100]          # 40 identical points
    qs = pts[:q] + 0.01
    xn = jnp.sum(jnp.asarray(pts) ** 2, axis=-1)
    rd, i = knn_pallas(jnp.asarray(pts), jnp.asarray(qs), xn, k=k,
                       tq=128, tn=512, interpret=True, grouped=True)
    i = np.asarray(i)
    for r in range(q):
        assert len(set(i[r].tolist())) == k  # no duplicates, no -1 gaps
