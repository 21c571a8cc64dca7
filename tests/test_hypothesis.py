"""Property-based fuzzing (hypothesis): shrinkable counterexamples over
adversarial structure the seeded sweep (test_fuzz.py) samples only by
luck — exact ties, duplicate rows, NaN rows, boundary-exact radii,
degenerate dims.  Mirrors the reference's oracle-test pattern
(ball_tree.rs:742-765: tree results must equal brute force) as
properties over arbitrary inputs.

Runtime discipline: small shapes (n <= 64, dim <= 8), derandomized, and
a bounded example count per property — this suite is a CI tier, not a
soak test.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from petal_neighbors_tpu import BallTree, BruteForce, VantagePointTree

# Every distinct (n, nq, k) shape costs a JIT compile — the example
# budget and the bucketed nq keep the whole module under ~3 minutes.
SETTINGS = dict(max_examples=12, deadline=None, derandomize=True,
                database=None)


@st.composite
def corpus(draw, min_n=1, max_n=48, max_dim=6):
    """(points, queries): finite f64 arrays with hypothesis-chosen
    structure — value scale, duplicate rows, tied coordinates."""
    n = draw(st.integers(min_n, max_n))
    dim = draw(st.integers(1, max_dim))
    nq = draw(st.sampled_from([1, 5, 8]))
    seed = draw(st.integers(0, 2**31 - 1))
    scale = draw(st.sampled_from([1e-3, 1.0, 1e4]))
    offset = draw(st.sampled_from([0.0, -37.0, 1e5]))
    quantize = draw(st.booleans())        # integer grid => exact ties
    rng = np.random.default_rng(seed)
    pts = rng.random((n, dim)) * scale + offset
    qs = rng.random((nq, dim)) * scale + offset
    if quantize:
        pts = np.round(pts / scale * 4) * (scale / 4)
        qs = np.round(qs / scale * 4) * (scale / 4)
    n_dup = draw(st.integers(0, min(3, n - 1)))
    for _ in range(n_dup):                # duplicate rows => tied dists
        i, j = rng.integers(0, n, 2)
        pts[i] = pts[j]
    return pts, qs


def _oracle_rd(pts, qs):
    d = qs[:, None, :] - pts[None, :, :]
    return np.einsum("qnd,qnd->qn", d, d)


@given(data=corpus(), k=st.integers(1, 8))
@settings(**SETTINGS)
def test_balltree_knn_distance_multiset(data, k):
    """Tree k-NN distances == oracle's k smallest (ties: any id order)."""
    pts, qs = data
    k_eff = min(k, len(pts))
    tree = BallTree(pts, "euclidean")
    dd, ii = tree.query_batch(qs, k)
    assert dd.shape == (len(qs), k_eff)
    rd = _oracle_rd(pts, qs)
    want = np.sort(rd, axis=1)[:, :k_eff]
    np.testing.assert_allclose(np.asarray(dd) ** 2, want,
                               rtol=1e-9, atol=1e-12)
    ii = np.asarray(ii)
    # returned ids must actually realize the returned distances
    got_rd = np.take_along_axis(rd, ii, axis=1)
    np.testing.assert_allclose(got_rd, want, rtol=1e-9, atol=1e-12)


@given(data=corpus(min_n=2), k=st.integers(1, 6))
@settings(**SETTINGS)
def test_indexes_agree(data, k):
    """All three indexes return the same distance multiset."""
    pts, qs = data
    d_bt, _ = BallTree(pts, "euclidean").query_batch(qs, k)
    d_vp, _ = VantagePointTree(pts, "euclidean").query_batch(qs, k)
    d_bf, _ = BruteForce(pts, "euclidean").query_batch(qs, k)
    np.testing.assert_allclose(d_bt, d_bf, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(d_vp, d_bf, rtol=1e-9, atol=1e-12)


@given(data=corpus(min_n=2), frac=st.sampled_from([0.0, 0.3, 1.0, 1.7]),
       exact_boundary=st.booleans())
@settings(**SETTINGS)
def test_radius_between_strict_and_inclusive(data, frac, exact_boundary):
    """Tree radius results sit between the strict (d < r) and inclusive
    (d <= r) oracle sets — the reference's own boundary envelope: leaf
    scans are strict while whole-subtree takes are inclusive
    (ball_tree.rs:271-277), so a boundary-exact point's membership
    depends on which path reached it, but NEVER beyond the envelope."""
    pts, qs = data
    rd = _oracle_rd(pts, qs)
    r = float(np.sqrt(np.maximum(np.median(rd), 0.0)) * frac)
    if exact_boundary and rd.size:       # radius exactly at a distance
        r = float(np.sqrt(rd[0, int(np.argmin(rd[0]))]))
    tree = BallTree(pts, "euclidean")
    for row, q in enumerate(qs):
        got = set(np.asarray(tree.query_radius(q, r)).tolist())
        strict = set(np.flatnonzero(rd[row] < r * r).tolist())
        incl = set(np.flatnonzero(rd[row] <= r * r * (1 + 1e-12)).tolist())
        assert strict <= got <= incl, (row, r)


@given(data=corpus(min_n=4), n_nan=st.integers(1, 2), k=st.integers(1, 2))
@settings(**SETTINGS)
def test_nan_rows_never_beat_finite(data, n_nan, k):
    """NaN-coordinate points are farthest (CHANGELOG.md:111-115): with
    enough finite points they never appear in the top-k."""
    pts, qs = data
    pts = pts.copy()
    pts[:n_nan, 0] = np.nan
    if len(pts) - n_nan < k:
        return
    for idx_cls in (BallTree, BruteForce, VantagePointTree):
        _, ii = idx_cls(pts, "euclidean").query_batch(qs, k)
        assert not np.isin(np.asarray(ii), np.arange(n_nan)).any(), idx_cls


@given(data=corpus(), k=st.integers(0, 64))
@settings(**SETTINGS)
def test_k_contracts(data, k):
    """k=0 -> empty; k>n -> n results; ascending sort (ball_tree.rs:102-121)."""
    pts, qs = data
    tree = BallTree(pts, "euclidean")
    dd, ii = tree.query_batch(qs, k)
    k_eff = min(k, len(pts))
    assert dd.shape == ii.shape == (len(qs), k_eff)
    if k_eff:
        dd = np.asarray(dd)
        assert (np.diff(dd, axis=1) >= 0).all()
        assert (np.asarray(ii) >= 0).all() and (np.asarray(ii) < len(pts)).all()


@given(data=corpus(min_n=2), k=st.integers(1, 5))
@settings(**SETTINGS)
def test_cosine_indexes_agree(data, k):
    """Cosine: BruteForce and BallTree return the same distance multiset
    (scale-invariant metric; zero-norm rows sort farthest)."""
    pts, qs = data
    d_bf, _ = BruteForce(pts, "cosine").query_batch(qs, k)
    d_bt, _ = BallTree(pts, "cosine").query_batch(qs, k)
    np.testing.assert_allclose(np.asarray(d_bt), np.asarray(d_bf),
                               rtol=1e-9, atol=1e-12)


@given(data=corpus(min_n=6, max_n=32), n_add=st.integers(0, 6),
       n_del=st.integers(0, 4), k=st.integers(1, 4))
@settings(**SETTINGS)
def test_dynamic_index_matches_rebuild(data, n_add, n_del, k):
    """A mutated DynamicIndex answers exactly like an index rebuilt from
    the surviving rows (the LSM segments + tombstones are invisible)."""
    from petal_neighbors_tpu import DynamicIndex
    pts, qs = data
    rng = np.random.default_rng(0)
    extra = rng.random((n_add, pts.shape[1])) * 2 - 1
    dyn = DynamicIndex(pts)
    ids = dyn.add(extra) if n_add else []
    removed = []
    if n_del:
        victims = list(range(0, min(n_del, len(pts))))
        dyn.remove(victims)
        removed = victims
    alive = np.concatenate(
        [np.delete(pts, removed, axis=0)] + ([extra] if n_add else []))
    if len(alive) == 0:
        return
    d_dyn, _ = dyn.query_batch(qs, k)
    d_ref, _ = BruteForce(alive, "euclidean").query_batch(qs, k)
    np.testing.assert_allclose(np.asarray(d_dyn), np.asarray(d_ref),
                               rtol=1e-9, atol=1e-12)
