"""Utility-layer coverage: profiling helpers, error types, tree geometry."""

import numpy as np
import pytest

from petal_neighbors_tpu.errors import (
    ArrayError, EmptyArrayError, NotContiguousError,
)
from petal_neighbors_tpu.utils.profiling import wall_time
from petal_neighbors_tpu.utils.tree_math import tree_shape


class TestErrors:
    def test_hierarchy(self):
        assert issubclass(EmptyArrayError, ArrayError)
        assert issubclass(NotContiguousError, ArrayError)
        assert issubclass(ArrayError, ValueError)

    def test_messages(self):
        assert str(EmptyArrayError()) == "array is empty"
        assert str(NotContiguousError()) == "array is not contiguous in memory"


class TestWallTime:
    def test_times_and_syncs(self):
        import jax.numpy as jnp
        out = {}
        with wall_time(out):
            out["result"] = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        assert out["seconds"] > 0
        assert float(out["result"][0, 0]) == 64.0


class TestTreeShapeGeometry:
    @pytest.mark.parametrize("n", [1, 2, 3, 5, 17, 64, 100])
    def test_ranges_partition(self, n):
        for leaf in (None, 4, 32):
            s = tree_shape(n, leaf)
            # root covers everything; siblings partition the parent
            assert s.range_start[0] == 0 and s.range_end[0] == n
            for i in range(s.n_leaves - 1):
                l, r = 2 * i + 1, 2 * i + 2
                assert s.range_start[l] == s.range_start[i]
                assert s.range_end[r] == s.range_end[i]
                assert s.range_end[l] == s.range_start[r]
            # every node non-empty
            assert (s.range_end > s.range_start).all()

    def test_leaf_size_bound(self):
        for n in (5, 100, 1000):
            for leaf in (4, 16, 128):
                s = tree_shape(n, leaf)
                lo = s.leaf_offset
                sizes = s.range_end[lo:] - s.range_start[lo:]
                assert sizes.max() <= max(leaf, 2)

    def test_interned(self):
        assert tree_shape(40, None) is tree_shape(40, None)


class TestMonotoneDistances:
    """TPU's approximate f32 sqrt is not monotone at the ulp level, so
    sorted-rd -> distance conversions clamp with a running max (observed
    on v5e: rd pair (1152900.75, 1152901.0) -> sqrt inverted by 2 ulps).
    CPU sqrt is correctly rounded, so this unit-tests the clamp itself."""

    def test_clamps_ulp_inversion(self):
        from petal_neighbors_tpu.ops.topk import monotone_distances
        d = np.array([[1.0, 1073.7323, 1073.7322, 2000.0]], np.float32)
        out = np.asarray(monotone_distances(d))
        assert (np.diff(out, axis=1) >= 0).all()
        np.testing.assert_allclose(out[0, [0, 1, 3]], d[0, [0, 1, 3]])

    def test_nan_and_inf_rows_unchanged(self):
        from petal_neighbors_tpu.ops.topk import monotone_distances
        d = np.array([[np.nan, np.nan], [1.0, np.inf]], np.float32)
        out = np.asarray(monotone_distances(d))
        assert np.isnan(out[0]).all()
        np.testing.assert_array_equal(out[1], d[1])


class TestQueryStream:
    def test_pipelined_results_match_sync(self, rng):
        from petal_neighbors_tpu import BruteForce, QueryStream
        pts = rng.standard_normal((500, 8)).astype(np.float32)
        qs = rng.standard_normal((20, 8)).astype(np.float32)
        idx = BruteForce.euclidean(pts)
        stream = QueryStream(idx, k=5)
        got = stream.query_many(qs)
        for row, (ids, d) in enumerate(got):
            want_i, want_d = idx.query(qs[row], 5)
            np.testing.assert_array_equal(ids, want_i)
            np.testing.assert_allclose(d, want_d, rtol=1e-6)
            assert ids.dtype == np.int64
