"""sklearn-adapter contract tests: exactness vs oracles and the sklearn
return-shape conventions (self-exclusion, object arrays, CSR graphs)."""

import numpy as np
import pytest

from petal_neighbors_tpu.sklearn import NearestNeighbors


def _oracle_d(pts, qs):
    return np.sqrt((((qs[:, None] - pts[None]) ** 2).sum(-1)))


@pytest.mark.parametrize("algorithm", ["auto", "ball_tree", "vp_tree",
                                       "brute"])
def test_kneighbors_exact(rng, algorithm):
    pts = rng.standard_normal((300, 4))
    qs = rng.standard_normal((40, 4))
    nn = NearestNeighbors(n_neighbors=7, algorithm=algorithm).fit(pts)
    d, i = nn.kneighbors(qs)
    od = np.sort(_oracle_d(pts, qs), axis=1)[:, :7]
    np.testing.assert_allclose(d, od, rtol=1e-9)
    assert i.dtype == np.int64 and d.shape == i.shape == (40, 7)


def test_self_query_excludes_own_point(rng):
    pts = rng.standard_normal((100, 3))
    nn = NearestNeighbors(n_neighbors=4).fit(pts)
    d, i = nn.kneighbors()
    rows = np.arange(100)
    assert not (i == rows[:, None]).any()
    assert (d > 0).all()
    # nearest excluding self == oracle's 2nd nearest
    od = np.sort(_oracle_d(pts, pts), axis=1)[:, 1:5]
    np.testing.assert_allclose(d, od, rtol=1e-9)


def test_self_query_with_duplicates(rng):
    pts = rng.standard_normal((60, 3))
    pts[10] = pts[20]                     # exact duplicate pair
    nn = NearestNeighbors(n_neighbors=2).fit(pts)
    d, i = nn.kneighbors()
    assert not (i == np.arange(60)[:, None]).any()
    assert d[10, 0] == 0.0 and i[10, 0] == 20    # the twin, not itself
    assert d[20, 0] == 0.0 and i[20, 0] == 10


def test_radius_neighbors_inclusive_and_metric_correct(rng):
    pts = rng.standard_normal((200, 3))
    qs = rng.standard_normal((9, 3))
    nn = NearestNeighbors(radius=1.2).fit(pts)
    d, ids = nn.radius_neighbors(qs)
    od = _oracle_d(pts, qs)
    for row in range(9):
        want = set(np.flatnonzero(od[row] <= 1.2).tolist())
        assert set(ids[row].tolist()) == want
        np.testing.assert_allclose(np.sort(d[row]),
                                   np.sort(od[row, ids[row]]), rtol=1e-9)


def test_radius_neighbors_cosine(rng):
    pts = rng.standard_normal((150, 5))
    qs = rng.standard_normal((6, 5))
    nn = NearestNeighbors(radius=0.3, metric="cosine",
                          algorithm="brute").fit(pts)
    d, ids = nn.radius_neighbors(qs)
    pn = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    od = 1.0 - qn @ pn.T
    for row in range(6):
        assert set(ids[row].tolist()) == \
            set(np.flatnonzero(od[row] <= 0.3 + 1e-12).tolist())


def test_graphs(rng):
    pts = rng.standard_normal((80, 3))
    nn = NearestNeighbors(n_neighbors=3, radius=1.0).fit(pts)
    g = nn.kneighbors_graph(pts[:10])
    assert g.shape == (10, 80) and g.nnz == 30
    gd = nn.kneighbors_graph(pts[:10], mode="distance")
    od = np.sort(_oracle_d(pts, pts[:10]), axis=1)[:, :3]
    np.testing.assert_allclose(np.sort(gd.data.reshape(10, 3), axis=1),
                               od, rtol=1e-9)
    rg = nn.radius_neighbors_graph(pts[:10], mode="distance")
    assert rg.shape == (10, 80)
    od_full = _oracle_d(pts, pts[:10])
    assert rg.nnz == int((od_full <= 1.0).sum())


def test_minkowski_p_and_errors(rng):
    pts = rng.standard_normal((90, 3))
    qs = rng.standard_normal((5, 3))
    nn = NearestNeighbors(n_neighbors=3, metric="minkowski", p=3.0,
                          algorithm="brute").fit(pts)
    d, i = nn.kneighbors(qs)
    od = (np.abs(qs[:, None] - pts[None]) ** 3).sum(-1) ** (1 / 3)
    np.testing.assert_allclose(d, np.sort(od, axis=1)[:, :3], rtol=1e-9)
    with pytest.raises(ValueError, match="algorithm"):
        NearestNeighbors(algorithm="kd_tree")
    with pytest.raises(ValueError, match="not .*fitted"):
        NearestNeighbors().kneighbors(qs)
