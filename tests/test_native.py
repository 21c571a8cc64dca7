"""Native (C++) builder parity tests.

The native builders must reproduce the Python reference-order builders
exactly in structure (idx permutation / node links, including quickselect
tie order) and to float-accumulation-order tolerance in geometry.
Skipped when no toolchain is available to build the library.
"""

import numpy as np
import pytest

from petal_neighbors_tpu import native
from petal_neighbors_tpu.distance import Cosine, Euclidean
from petal_neighbors_tpu.trees import ball_build
from petal_neighbors_tpu.trees.vantage import _build_host
from petal_neighbors_tpu.utils.tree_math import tree_shape

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


class TestBallNative:
    @pytest.mark.parametrize("n,dim", [(37, 3), (128, 5), (100, 2)])
    def test_exact_match_reference_order(self, rng, n, dim):
        pts = rng.uniform(0, 1, (n, dim))
        pts[rng.integers(0, n, 10)] = pts[0]  # inject ties
        s = tree_shape(n, None)
        ref = ball_build.build_reference_order(pts, s, Euclidean())
        c, r, idx = native.ball_build(pts, s.n_nodes, Euclidean())
        np.testing.assert_array_equal(idx, ref.idx)  # incl. tie order
        np.testing.assert_allclose(c, ref.centroids, atol=1e-12)
        np.testing.assert_allclose(r, ref.radii, rtol=1e-12)

    def test_cosine_metric(self, rng):
        pts = rng.standard_normal((40, 4))
        s = tree_shape(40, None)
        ref = ball_build.build_reference_order(pts, s, Cosine())
        c, r, idx = native.ball_build(pts, s.n_nodes, Cosine())
        np.testing.assert_array_equal(idx, ref.idx)
        np.testing.assert_allclose(r, ref.radii, rtol=1e-10, atol=1e-14)

    def test_f32(self, rng):
        pts = rng.uniform(0, 1, (64, 3)).astype(np.float32)
        s = tree_shape(64, None)
        c, r, idx = native.ball_build(pts, s.n_nodes, Euclidean())
        assert c.dtype == np.float32
        assert sorted(idx.tolist()) == list(range(64))


class TestVpNative:
    @pytest.mark.parametrize("n,dim", [(23, 3), (100, 4), (257, 2)])
    def test_structure_matches_python(self, rng, n, dim):
        pts = rng.uniform(0, 1, (n, dim))
        py = _build_host(pts, Euclidean())
        vp, radius, near, far, root, depth = native.vp_build(pts, Euclidean())
        np.testing.assert_array_equal(vp, np.asarray(py[0]))
        np.testing.assert_array_equal(near, np.asarray(py[2]))
        np.testing.assert_array_equal(far, np.asarray(py[3]))
        assert root == py[4] and depth == py[5]
        # geometry: equal to accumulation-order tolerance
        np.testing.assert_allclose(radius, np.asarray(py[1]), rtol=1e-12)
