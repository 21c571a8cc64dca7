"""scikit-learn-compatible adapter: ``NearestNeighbors`` over the TPU
engines.

The reference crate's users reach it through petal-clustering's Rust
API; the Python ecosystem's lingua franca for the same role is
``sklearn.neighbors.NearestNeighbors``.  This module adapts the exact
TPU indexes to that surface — ``fit`` / ``kneighbors`` /
``radius_neighbors`` / ``kneighbors_graph`` / ``radius_neighbors_graph``
— so existing sklearn-shaped pipelines (DBSCAN/OPTICS drivers, UMAP's
k-NN stage, …) can swap in the TPU engine without code changes.

Semantics follow sklearn where the two differ from the reference crate:

* ``kneighbors(X=None)`` excludes each training point from its own
  neighbor list (sklearn contract); with ``X`` given there is no
  exclusion (the reference's ``query`` never excludes).
* ``radius_neighbors`` uses the uniform inclusive ``d <= r`` rule
  (sklearn and the reference's *documented* contract,
  ball_tree.rs:123-124) via the streaming capped brute path
  (ops.bruteforce.radius_capped), not the ball tree's
  take-inclusive/scan-strict quirk — and never materializes anything
  (n_queries, n)-shaped.
* out-of-contract ``n_neighbors`` raises sklearn's own errors
  (k <= 0; k [+1 for self-query] > n_samples_fit) instead of the
  engines' silent k>n clamp; ``mode`` strings are validated.

Everything stays exact (recall 1.0) — ``algorithm`` only selects which
exact engine serves the queries.
"""

from __future__ import annotations

import numpy as np

from .trees import BallTree, BruteForce, VantagePointTree

__all__ = ["NearestNeighbors"]

_ALGOS = ("auto", "ball_tree", "vp_tree", "brute")


class NearestNeighbors:
    """Exact nearest-neighbor search with the sklearn estimator shape.

    Parameters mirror ``sklearn.neighbors.NearestNeighbors`` where they
    make sense here: ``n_neighbors`` (default k), ``radius`` (default
    ε), ``algorithm`` ("auto" picks BruteForce at high dimension —
    where metric trees cannot prune and the MXU path is fastest — and
    the ball tree otherwise), ``metric`` (any registered metric name or
    Metric instance; "minkowski" honors ``p``).
    """

    def __init__(self, *, n_neighbors: int = 5, radius: float = 1.0,
                 algorithm: str = "auto", leaf_size: int | None = None,
                 metric="euclidean", p: float = 2.0):
        if algorithm not in _ALGOS:
            raise ValueError(f"algorithm must be one of {_ALGOS}")
        self.n_neighbors = int(n_neighbors)
        self.radius = float(radius)
        self.algorithm = algorithm
        self.leaf_size = leaf_size
        self.metric = metric
        self.p = p
        self._index = None

    # -- estimator surface -------------------------------------------------
    def fit(self, X, y=None):
        """Build the index over ``X`` (n_samples, n_features)."""
        from .distance import DIRECT_DIM_MAX, Minkowski, get_metric

        metric = self.metric
        if isinstance(metric, str):
            if metric == "minkowski":
                metric = Minkowski(self.p) if self.p != 2.0 else "euclidean"
            metric = get_metric(metric)
        X = np.asarray(X)
        algo = self.algorithm
        if algo == "auto":
            # high-dim: trees cannot prune, the MXU brute path wins;
            # low-dim: the ball tree's pruning wins
            algo = "brute" if X.shape[1] > DIRECT_DIM_MAX else "ball_tree"
        if algo == "ball_tree":
            kw = {} if self.leaf_size is None else {
                "leaf_size": self.leaf_size}
            self._index = BallTree(X, metric, **kw)
        elif algo == "vp_tree":
            self._index = VantagePointTree(X, metric)
        else:
            self._index = BruteForce(X, metric)
        self._fit_X = self._index.points
        return self

    @property
    def n_samples_fit_(self) -> int:
        # .points uniformly; num_points is a METHOD on the tree classes
        # (the reference's accessor shape, ball_tree.rs:351-353) but a
        # property on BruteForce
        self._check_fitted()
        return int(self._index.points.shape[0])

    def _check_fitted(self):
        if self._index is None:
            raise ValueError("This NearestNeighbors instance is not "
                             "fitted yet; call fit(X) first")

    # -- k-NN ---------------------------------------------------------------
    def kneighbors(self, X=None, n_neighbors: int | None = None,
                   return_distance: bool = True):
        """(distances, indices) of the k nearest training points,
        ascending — shapes (n_queries, k).  ``X=None`` queries the
        training set itself with self-exclusion (sklearn contract).

        Raises sklearn's errors for out-of-contract ``n_neighbors``:
        k <= 0, and k (+1 for self-query) exceeding ``n_samples_fit_``
        (the engine-level k>n clamp would silently return fewer columns
        where sklearn promises an exception)."""
        self._check_fitted()
        k = self.n_neighbors if n_neighbors is None else int(n_neighbors)
        if k <= 0:
            raise ValueError(f"Expected n_neighbors > 0. Got {k}")
        self_query = X is None
        qs = np.asarray(self._fit_X) if self_query else np.asarray(X)
        kq = k + 1 if self_query else k
        n_fit = self.n_samples_fit_
        if kq > n_fit:
            raise ValueError(
                f"Expected n_neighbors <= n_samples_fit, but "
                f"n_neighbors = {kq}, n_samples_fit = {n_fit}, "
                f"n_samples = {len(qs)}")
        d, i = self._index.query_batch(qs, kq)
        d = np.asarray(d)
        i = np.asarray(i)
        if self_query:
            # drop each row's own id (ties: the duplicate id, wherever
            # the engine ranked it among equals)
            rows = np.arange(len(qs))
            own = i == rows[:, None]
            # exactly one self match per row when k+1 <= n; fall back to
            # dropping the first column when the point is duplicated and
            # its own id was crowded out
            has_own = own.any(axis=1)
            first = np.where(has_own, own.argmax(axis=1), 0)
            keep = np.ones_like(i, dtype=bool)
            keep[rows, first] = False
            i = i[keep].reshape(len(qs), kq - 1)
            d = d[keep].reshape(len(qs), kq - 1)
        if return_distance:
            return d, i.astype(np.int64)
        return i.astype(np.int64)

    @staticmethod
    def _check_mode(mode: str) -> None:
        if mode not in ("connectivity", "distance"):
            raise ValueError(
                f'Unsupported mode, must be one of "connectivity" or '
                f'"distance" but got "{mode}" instead')

    def kneighbors_graph(self, X=None, n_neighbors: int | None = None,
                         mode: str = "connectivity"):
        """Sparse CSR (n_queries, n_samples_fit): 1s or distances."""
        from scipy.sparse import csr_matrix

        self._check_mode(mode)
        d, i = self.kneighbors(X, n_neighbors, return_distance=True)
        nq, k = i.shape
        data = np.ones(nq * k) if mode == "connectivity" else d.ravel()
        indptr = np.arange(0, nq * k + 1, k)
        return csr_matrix((data, i.ravel(), indptr),
                          shape=(nq, self.n_samples_fit_))

    # -- radius -------------------------------------------------------------
    def radius_neighbors(self, X=None, radius: float | None = None,
                         return_distance: bool = True):
        """Per-query arrays of neighbor ids (and distances) within
        ``radius`` (inclusive d <= r), as object arrays of variable
        length — the sklearn return shape.

        Memory discipline matches the engines': a streamed count pass
        sizes the result, a streamed capped pass collects ids, and
        distances are gathered per id list — nothing (n_queries, n)-shaped
        is ever materialized (a SIFT-1M x 10k-query call would need a
        40 GB distance matrix otherwise)."""
        from .ops import bruteforce as bf

        self._check_fitted()
        r = float(radius if radius is not None else self.radius)
        self_query = X is None
        qs = np.asarray(self._fit_X) if self_query else np.asarray(X)
        pts = np.asarray(self._fit_X)
        metric = self._index.metric
        # the uniform inclusive d <= r rule promised above — NOT the ball
        # tree's take-inclusive/scan-strict boundary quirk; NaN rows never
        # match (NaN -> +inf).  Counts first (streamed, (Q,) output), then
        # one capped collection sized by the worst query.
        counts = np.asarray(bf.radius_counts_streaming(pts, qs, r, metric,
                                                       inclusive=True))
        cap = int(counts.max()) if len(counts) else 0
        ids_out = np.empty(len(qs), dtype=object)
        d_out = np.empty(len(qs), dtype=object)
        if cap == 0:
            for row in range(len(qs)):
                ids_out[row] = np.empty(0, dtype=np.int64)
                d_out[row] = np.empty(0, dtype=np.float64)
            return (d_out, ids_out) if return_distance else ids_out
        ids, _ = bf.radius_capped(pts, qs, r, metric, cap=cap,
                                  inclusive=True)
        if return_distance:
            d_cap = np.asarray(bf.distances_at(pts, qs, ids, metric))
        ids = np.asarray(ids)
        for row in range(len(qs)):
            sel = ids[row] >= 0
            if self_query:
                sel &= ids[row] != row
            ids_out[row] = ids[row, sel].astype(np.int64)
            if return_distance:
                d_out[row] = d_cap[row, sel].astype(np.float64)
        if return_distance:
            return d_out, ids_out
        return ids_out

    def radius_neighbors_graph(self, X=None, radius: float | None = None,
                               mode: str = "connectivity"):
        """Sparse CSR ε-adjacency (the DBSCAN driver shape)."""
        from scipy.sparse import csr_matrix

        self._check_mode(mode)
        d, ids = self.radius_neighbors(X, radius, return_distance=True)
        nq = len(ids)
        indptr = np.zeros(nq + 1, dtype=np.int64)
        np.cumsum([len(x) for x in ids], out=indptr[1:])
        indices = (np.concatenate(ids) if indptr[-1]
                   else np.empty(0, dtype=np.int64))
        if mode == "connectivity":
            data = np.ones(indptr[-1])
        else:
            data = (np.concatenate(d) if indptr[-1] else np.empty(0))
        return csr_matrix((data, indices, indptr),
                          shape=(nq, self.n_samples_fit_))
