"""Randomized consistency sweep: every index must agree with the
brute-force oracle across random shapes, dtypes, metrics, leaf sizes."""

import numpy as np
import pytest

from petal_neighbors_tpu import BallTree, BruteForce, VantagePointTree
from petal_neighbors_tpu.distance import Cosine, Euclidean, Minkowski


def _oracle_sets(pts, qs, k, metric):
    p = pts.astype(np.float64)
    q = qs.astype(np.float64)
    if isinstance(metric, Cosine):
        pn = p / np.linalg.norm(p, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        d = 1 - qn @ pn.T
    elif isinstance(metric, Minkowski):
        d = (np.abs(q[:, None] - p[None]) ** metric.p).sum(-1)
    else:
        d = ((q[:, None] - p[None]) ** 2).sum(-1)
    return np.argsort(d, axis=1, kind="stable")[:, :k], np.sort(d, 1)[:, :k]


CASES = []
_r = np.random.default_rng(2026)
for _ in range(14):
    CASES.append(dict(
        n=int(_r.integers(3, 400)),
        dim=int(_r.integers(1, 40)),
        k=int(_r.integers(1, 12)),
        leaf=[None, 4, 16, 64][int(_r.integers(0, 4))],
        dtype=[np.float32, np.float64][int(_r.integers(0, 2))],
        metric=[Euclidean(), Cosine(), Minkowski(3.0)][int(_r.integers(0, 3))],
        offset=float(_r.choice([0.0, 50.0])),
        seed=int(_r.integers(0, 1 << 30)),
    ))


@pytest.mark.parametrize("case", CASES,
                         ids=[f"c{i}" for i in range(len(CASES))])
def test_tree_vs_oracle(case):
    rng = np.random.default_rng(case["seed"])
    metric = case["metric"]
    pts = (rng.standard_normal((case["n"], case["dim"]))
           + case["offset"]).astype(case["dtype"])
    if isinstance(metric, Cosine) and case["offset"] == 0.0:
        pts += 1e-3  # avoid exactly-zero rows
    qs = (rng.standard_normal((7, case["dim"]))
          + case["offset"]).astype(case["dtype"])
    k = min(case["k"], case["n"])
    oi, od = _oracle_sets(pts, qs, k, metric)

    tree = BallTree(pts, metric, leaf_size=case["leaf"])
    d, i = tree.query_batch(qs, k)
    tol = 1e-3 if case["dtype"] == np.float32 else 1e-9
    for r in range(7):
        got = sorted(np.asarray(d[r]).tolist())
        want = metric.rdistance_to_distance(np.asarray(od[r]))
        np.testing.assert_allclose(got, np.asarray(want), rtol=tol,
                                   atol=tol)

    flat = BruteForce(pts, metric)
    d2, i2 = flat.query_batch(qs, k)
    np.testing.assert_allclose(np.sort(np.asarray(d2), 1),
                               np.sort(np.asarray(d), 1), rtol=tol, atol=tol)
