"""Row-sort Pallas kernel tests (interpret mode on CPU).

Two implementations back the large-k collect path: the bitonic network
(lane rolls) and the counting-rank kernel (broadcast compares, no
permutes — the round-4 replacement for the bitonic's measured lane-
permute wall).  Both sort the per-query candidate pool (key = rdist,
payload = point id) without XLA's sort custom call and share one
contract under test here: ascending keys, payload follows its key,
+inf/-1 padding stays at the tail, non-power-of-two widths and ragged
query counts round-trip.
"""

import functools

import numpy as np
import jax.numpy as jnp
import pytest

from petal_neighbors_tpu.ops.pallas.sort_kernel import bitonic_sort_pairs as _bitonic
from petal_neighbors_tpu.ops.pallas.rank_sort_kernel import rank_sort_pairs as _rank


@pytest.fixture(params=["bitonic", "rank"])
def bitonic_sort_pairs(request):
    """Both row-sort kernels satisfy the same contract; every test in
    this module runs against each."""
    return _bitonic if request.param == "bitonic" else _rank


def check_sorted_pairs(keys, vals, out_d, out_i):
    q, n = keys.shape
    assert out_d.shape == (q, n) and out_i.shape == (q, n)
    assert (np.diff(out_d, axis=1) >= 0).all()
    for r in range(q):
        np.testing.assert_array_equal(np.sort(keys[r]), out_d[r])
        # payload follows its key (unique keys in these fixtures)
        order = np.argsort(keys[r], kind="stable")
        np.testing.assert_array_equal(vals[r][order], out_i[r])


@pytest.mark.parametrize("n", [128, 130, 512, 1000, 2048])
def test_sorts_random_rows(bitonic_sort_pairs, rng, n):
    q = 16
    # unique keys per row so payload-tracking is well-defined
    keys = rng.permutation(np.arange(q * n, dtype=np.float32) * 0.5
                           ).reshape(q, n)
    vals = np.arange(q * n, dtype=np.int32).reshape(q, n)
    out_d, out_i = bitonic_sort_pairs(jnp.asarray(keys), jnp.asarray(vals),
                                      interpret=True)
    check_sorted_pairs(keys, vals, np.asarray(out_d), np.asarray(out_i))


def test_inf_padding_stays_at_tail(bitonic_sort_pairs, rng):
    q, n = 8, 384
    keys = rng.standard_normal((q, n)).astype(np.float32)
    keys[:, 300:] = np.inf
    vals = np.arange(q * n, dtype=np.int32).reshape(q, n)
    vals[:, 300:] = -1
    out_d, out_i = bitonic_sort_pairs(jnp.asarray(keys), jnp.asarray(vals),
                                      interpret=True)
    out_d, out_i = np.asarray(out_d), np.asarray(out_i)
    assert np.isinf(out_d[:, 300:]).all()
    assert (out_i[:, 300:] == -1).all()
    assert np.isfinite(out_d[:, :300]).all()


def test_ragged_query_count(bitonic_sort_pairs, rng):
    """q below (and not dividing) the row tile: padded rows must not leak."""
    q, n = 5, 256
    keys = rng.standard_normal((q, n)).astype(np.float32) * 10
    vals = rng.integers(0, 1 << 20, (q, n)).astype(np.int32)
    out_d, out_i = bitonic_sort_pairs(jnp.asarray(keys), jnp.asarray(vals),
                                      tq=16, interpret=True)
    out_d = np.asarray(out_d)
    assert out_d.shape == (q, n)
    np.testing.assert_allclose(np.sort(keys, axis=1), out_d, rtol=0,
                               atol=0)


def test_duplicate_keys_keep_valid_payloads(bitonic_sort_pairs, rng):
    """Ties: payload order is arbitrary but must be a permutation of the
    tied ids (no duplicate/lost payloads)."""
    q, n = 4, 512
    keys = rng.integers(0, 8, (q, n)).astype(np.float32)
    vals = np.arange(q * n, dtype=np.int32).reshape(q, n)
    out_d, out_i = bitonic_sort_pairs(jnp.asarray(keys), jnp.asarray(vals),
                                      interpret=True)
    out_d, out_i = np.asarray(out_d), np.asarray(out_i)
    for r in range(q):
        np.testing.assert_array_equal(np.sort(keys[r]), out_d[r])
        assert set(out_i[r].tolist()) == set(vals[r].tolist())
        # every payload sits under its own key
        key_of = dict(zip(vals[r].tolist(), keys[r].tolist()))
        assert all(key_of[int(v)] == out_d[r][j]
                   for j, v in enumerate(out_i[r]))
