"""Golden-fixture regression tests.

Pins the reference-semantics builders' exact outputs (idx permutation
including quickselect tie order; VP structure) across code changes —
tests/golden/build_fixtures.json was generated from
``build_reference_order`` / ``_build_host`` and must never drift.

Provenance: the fixtures are SELF-generated (this repo's own builders),
so the tie-order claims are regression pinning of a careful transcription
of ball_tree.rs:545-569 / vantage_point_tree.rs:146-197 — by-construction
parity, not by-measurement (no Rust toolchain exists in this
environment).  If one ever appears, regenerate from the crate itself
(e.g. dump ``idx`` from ball_tree.rs:742-765-style runs on these seeds)
and replace the fixtures.
"""

import json
import os

import numpy as np
import pytest

from petal_neighbors_tpu import native
from petal_neighbors_tpu.distance import Euclidean
from petal_neighbors_tpu.trees import ball_build
from petal_neighbors_tpu.trees.vantage import _build_host
from petal_neighbors_tpu.utils.tree_math import tree_shape

FIXTURES = json.load(open(
    os.path.join(os.path.dirname(__file__), "golden",
                 "build_fixtures.json")))


def _points(case):
    rng = np.random.default_rng(case["seed"])
    return np.round(rng.uniform(0, 1, (case["n"], case["dim"])), 6)


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_ball_reference_order_pinned(name):
    case = FIXTURES[name]
    pts = _points(case)
    s = tree_shape(case["n"], None)
    data = ball_build.build_reference_order(pts, s, Euclidean())
    assert data.idx.tolist() == case["ball_idx"]
    np.testing.assert_allclose(
        np.round(data.radii, 6), case["ball_radii_6dp"], atol=2e-6)


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_native_matches_golden(name):
    if not native.available():
        pytest.skip("native library not built")
    case = FIXTURES[name]
    pts = _points(case)
    s = tree_shape(case["n"], None)
    _, _, idx = native.ball_build(pts, s.n_nodes, Euclidean())
    assert idx.tolist() == case["ball_idx"]


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_vp_structure_pinned(name):
    case = FIXTURES[name]
    pts = _points(case)
    vp, radius, near, far, root, _ = _build_host(pts, Euclidean())
    assert np.asarray(vp).tolist() == case["vp_vantage"]
    assert np.asarray(near).tolist() == case["vp_near"]
    assert np.asarray(far).tolist() == case["vp_far"]
    assert root == case["vp_root"]
