"""HDBSCAN consumer pipeline (cluster.py): condensed tree, stability
extraction, end-to-end labels.

Oracle: sklearn.cluster.HDBSCAN — an independent implementation of the
same published algorithm (the reference's stated downstream consumer is
petal-clustering's HDBSCAN; CHANGELOG.md:70).  Structural invariants are
checked directly on the condensed tree.
"""

import numpy as np
import pytest

from petal_neighbors_tpu.cluster import (CondensedTree, cluster_stability,
                                         condense_tree, extract_clusters,
                                         hdbscan, single_linkage)


def _blobs(rng, centers, scale, per):
    pts = np.concatenate([rng.normal(c, scale, (per, len(c)))
                          for c in centers])
    return pts.astype(np.float64)


class TestCondenseTree:
    def test_structural_invariants(self, rng):
        pts = _blobs(rng, [[0, 0], [6, 6], [0, 9]], 0.4, 60)
        res = hdbscan(pts, min_cluster_size=10)
        ct = res.condensed
        n = ct.n_points
        pt_rows = ct.child < n
        # every point falls out exactly once
        assert sorted(ct.child[pt_rows]) == list(range(n))
        np.testing.assert_array_equal(ct.size[pt_rows], 1)
        # cluster rows: parents exist, sizes >= min_cluster_size, and a
        # split always creates exactly two children at one lambda
        cl_rows = ~pt_rows
        assert (ct.size[cl_rows] >= 10).all()
        for p in np.unique(ct.parent[cl_rows]):
            sel = cl_rows & (ct.parent == p)
            assert sel.sum() == 2
            assert len(np.unique(ct.lam[sel])) == 1
        # a cluster's size equals the points that fall out of its subtree
        kids = {}
        for p, c in zip(ct.parent[cl_rows], ct.child[cl_rows]):
            kids.setdefault(int(p), []).append(int(c))
        for p, c, s in zip(ct.parent, ct.child, ct.size):
            if c < n:
                continue
            cnt, stack = 0, [int(c)]
            while stack:
                x = stack.pop()
                cnt += int(np.sum(pt_rows & (ct.parent == x)))
                stack.extend(kids.get(x, ()))
            assert cnt == s
        # lambdas never decrease walking down the tree
        births = {int(c): float(l) for c, l in
                  zip(ct.child[cl_rows], ct.lam[cl_rows])}
        births[n] = 0.0
        for p, l in zip(ct.parent, ct.lam):
            assert float(l) >= births[int(p)] - 1e-12

    def test_min_cluster_size_validated(self):
        Z = np.array([[0.0, 1.0, 1.0, 2.0]])
        with pytest.raises(ValueError):
            condense_tree(Z, min_cluster_size=1)

    def test_two_point_chain(self):
        # 3 points merging at increasing heights, mcs=2: root cluster
        # only — the first merge creates a 2-cluster vs a single point
        Z = single_linkage([0, 2], [1, 1], [1.0, 4.0], 3)
        ct = condense_tree(Z, min_cluster_size=2)
        assert ct.n_points == 3
        # no true split (one side is always a lone point): only point rows
        assert (ct.child < 3).all()
        stab = cluster_stability(ct)
        assert set(stab) == {3}


class TestExtraction:
    def test_well_separated_blobs(self, rng):
        pts = _blobs(rng, [[0, 0], [10, 10], [0, 14]], 0.3, 70)
        res = hdbscan(pts, min_cluster_size=15)
        assert set(np.unique(res.labels)) == {0, 1, 2}
        # each blob is one label
        for b in range(3):
            seg = res.labels[b * 70:(b + 1) * 70]
            assert len(np.unique(seg)) == 1
        assert res.probabilities.min() >= 0.0
        assert res.probabilities.max() <= 1.0
        assert (res.probabilities[res.labels >= 0] > 0.0).all()
        assert len(res.stabilities) == 3

    def test_noise_gets_minus_one(self, rng):
        pts = np.concatenate([
            _blobs(rng, [[0, 0], [8, 8]], 0.25, 60),
            rng.uniform(-20, 20, (15, 2)),
        ])
        res = hdbscan(pts, min_cluster_size=12)
        assert (res.labels[:120] >= 0).all()
        assert (res.labels == -1).sum() >= 8     # far uniform points
        np.testing.assert_array_equal(res.probabilities[res.labels < 0], 0.0)

    def test_single_cluster_policy(self, rng):
        pts = rng.normal(0.0, 1.0, (80, 3))
        res = hdbscan(pts, min_cluster_size=10)
        res1 = hdbscan(pts, min_cluster_size=10, allow_single_cluster=True)
        # unimodal data: root-excluded EOM may fragment or call all noise,
        # but allow_single_cluster must produce >= as many clustered points
        assert (res1.labels >= 0).sum() >= (res.labels >= 0).sum()

    def test_tiny_inputs(self):
        res = hdbscan(np.zeros((1, 2)), min_cluster_size=5)
        assert res.labels.tolist() == [-1]
        res = hdbscan(np.random.default_rng(0).normal(size=(3, 2)),
                      min_cluster_size=5)
        assert res.labels.tolist() == [-1, -1, -1]


def _sklearn_tree_labels(Z, min_cluster_size):
    """sklearn's own condense + EOM extraction on a given dendrogram —
    the strict oracle for everything cluster.py adds on top of the MST
    (the MST itself is oracle-tested in test_boruvka.py)."""
    T = pytest.importorskip("sklearn.cluster._hdbscan._tree")
    H = np.empty(len(Z), dtype=T.HIERARCHY_dtype)
    H["left_node"] = Z[:, 0].astype(np.int64)
    H["right_node"] = Z[:, 1].astype(np.int64)
    H["value"] = Z[:, 2]
    H["cluster_size"] = Z[:, 3].astype(np.int64)
    return T.tree_to_labels(H, min_cluster_size)


class TestSklearnOracle:
    """vs sklearn.cluster.HDBSCAN — an independent implementation of the
    same published algorithm (f64, same conventions: min_samples
    kneighbors include self, EOM, root excluded).

    Mutual-reachability weights tie intrinsically (plateaus at shared
    core distances), and tied weights admit multiple valid MSTs whose
    dendrograms can assign tie-boundary points to either side — so the
    strict bit-exact oracle runs on a SHARED dendrogram, and the
    end-to-end check tolerates only tie-boundary reassignment."""

    @pytest.mark.parametrize("seed,mcs,ms", [(0, 10, 10), (1, 15, 5),
                                             (2, 8, 8), (3, 20, 10)])
    def test_condense_extract_exact_on_shared_dendrogram(self, seed, mcs,
                                                         ms):
        from petal_neighbors_tpu.trees import mutual_reachability_mst

        rng = np.random.default_rng(seed)
        centers = rng.uniform(0, 30, (4, 3))
        pts = np.concatenate(
            [rng.normal(c, 0.5, (80, 3)) for c in centers]
            + [rng.uniform(0, 30, (40, 3))])
        us, vs, ws = mutual_reachability_mst(pts, ms)
        Z = single_linkage(us, vs, ws, len(pts))
        want_labels, want_probs = _sklearn_tree_labels(Z, mcs)
        ct = condense_tree(Z, mcs)
        labels, probs, _ = extract_clusters(ct)
        np.testing.assert_array_equal(labels, want_labels)
        np.testing.assert_allclose(probs, want_probs, atol=1e-12)

    @pytest.mark.parametrize("seed,mcs,ms", [(0, 10, 10), (2, 8, 8)])
    def test_end_to_end_matches_up_to_ties(self, seed, mcs, ms):
        from sklearn.cluster import HDBSCAN
        from sklearn.metrics import adjusted_rand_score

        rng = np.random.default_rng(seed)
        centers = rng.uniform(0, 30, (4, 3))
        pts = np.concatenate(
            [rng.normal(c, 0.5, (80, 3)) for c in centers]
            + [rng.uniform(0, 30, (40, 3))])
        got = hdbscan(pts, min_cluster_size=mcs, min_samples=ms)
        want = HDBSCAN(min_cluster_size=mcs, min_samples=ms).fit(pts)
        assert adjusted_rand_score(want.labels_, got.labels) >= 0.98
        # disagreements (different valid MSTs under tied weights) stay
        # rare and never flip the cluster/noise decision materially
        # (label NUMBERS may permute between valid MSTs — compare the
        # partition, not the ids)
        frac = np.mean((want.labels_ < 0) != (got.labels < 0))
        assert frac <= 0.02
        assert len(np.unique(want.labels_)) == len(np.unique(got.labels))

    def test_scan_scheme_k64_exact_on_shared_dendrogram(self):
        """The treeless scan path (dim > 3) at k = 64 — the round-4
        routing-hole regression gate — through the full consumer."""
        from petal_neighbors_tpu.trees import mutual_reachability_mst

        rng = np.random.default_rng(7)
        centers = rng.uniform(0, 40, (3, 8))
        pts = np.concatenate(
            [rng.normal(c, 0.6, (120, 8)) for c in centers])
        us, vs, ws = mutual_reachability_mst(pts, 64, scheme="scan")
        Z = single_linkage(us, vs, ws, len(pts))
        want_labels, want_probs = _sklearn_tree_labels(Z, 25)
        ct = condense_tree(Z, 25)
        labels, probs, _ = extract_clusters(ct)
        np.testing.assert_array_equal(labels, want_labels)
        np.testing.assert_allclose(probs, want_probs, atol=1e-12)
        # and the MST itself matches the dense f64 oracle's weight sum
        d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        core = np.sort(d, 1)[:, 63]
        m = np.maximum(d, np.maximum(core[:, None], core[None, :]))
        np.fill_diagonal(m, 0.0)
        from scipy.sparse.csgraph import minimum_spanning_tree
        T = minimum_spanning_tree(m).toarray()
        assert abs(np.sum(ws) - T.sum()) <= 1e-6 * T.sum()
