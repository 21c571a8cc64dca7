"""BruteForce: the flat exact index (no tree, pure MXU).

Not present in the reference (which only ships tree indexes), but it is
the reference's own test oracle promoted to a first-class index
(ball_tree.rs:873-894 ``naive_k_nearest_neighbors``): at high dimension
metric trees cannot prune and a tiled distance matmul is the
speed-of-light exact search on TPU (BASELINE config #3).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..distance import Euclidean, Metric, get_metric
from ..ops import bruteforce as bf
from ..utils.validation import check_points, check_query, check_query_batch

__all__ = ["BruteForce"]


class BruteForce:
    """Exact k-NN index backed by streamed MXU distance tiles."""

    def __init__(self, points, metric: Metric | str = "euclidean"):
        self.metric = get_metric(metric)
        self.points = check_points(points)         # public, original data
        self.metric.validate_dim(self.points.shape[1])
        # The matmul distance form needs centered data for exactness
        # (ops.bruteforce.center_of) and index-resident squared norms;
        # both are paid once at build time.  Distances are unchanged
        # (translation invariance); low-dim paths use the direct form.
        self._center = None
        self._qpoints = self.points                # what queries run against
        self.point_norms = None
        #: backend that served the most recent ``query_batch`` call
        #: ("pallas" | "xla" | None before the first query)
        self.last_backend = None
        # Pre-padded copies for the fused Pallas kernel (padding a large
        # corpus per query call costs an extra full-index HBM copy)
        self._pallas_pts = self._pallas_norms = self._pallas_split = None
        pallas_ok = bf._pallas_eligible(self.points, self.points[:1], 1,
                                        self.metric)
        if isinstance(self.metric, Euclidean):
            from ..distance import DIRECT_DIM_MAX
            high_dim = self.points.shape[1] > DIRECT_DIM_MAX
            if high_dim and pallas_ok:
                # one fused device program for all index artifacts
                (self._center, self._qpoints, self.point_norms,
                 self._pallas_pts, self._pallas_norms,
                 self._pallas_split) = bf.prepare_euclidean_index(
                    self.points, bf.pallas_tile_n(self.points.shape[1]))
            else:
                if high_dim:
                    self._center = bf.center_of(self.points)
                    self._qpoints = self.points - self._center
                self.point_norms = jnp.sum(self._qpoints * self._qpoints,
                                           axis=-1)

    @classmethod
    def euclidean(cls, points) -> "BruteForce":
        return cls(points, Euclidean())

    def save(self, path) -> None:
        """Checkpoint the index to an ``.npz`` (see utils.serialize)."""
        from ..utils.serialize import save_index
        save_index(self, path)

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    @property
    def dim(self) -> int:
        return self.points.shape[1]

    def _q(self, qs):
        """Center queries to match the index's centered representation."""
        return qs if self._center is None else qs - self._center

    # -- single-query API (reference-shaped) ------------------------------
    def query_nearest(self, point):
        """(index, distance) of the nearest point (ball_tree.rs:80-87)."""
        q = check_query(point, self.dim, self.points.dtype)
        d, i = bf.knn(self._qpoints, self._q(q[None, :]), 1, self.metric,
                      point_norms=self.point_norms, assume_centered=True)
        return int(i[0, 0]), float(d[0, 0])

    def query(self, point, k: int):
        """(indices, distances), ascending; k=0 -> empty; k>n -> n results
        (ball_tree.rs:102-121)."""
        q = check_query(point, self.dim, self.points.dtype)
        d, i = bf.knn(self._qpoints, self._q(q[None, :]), k, self.metric,
                      point_norms=self.point_norms, assume_centered=True)
        return np.asarray(i[0]), np.asarray(d[0])

    def query_radius(self, point, distance):
        """Indices with distance <= ``distance`` (ball_tree.rs:123-142).

        The flat index has no subtree-take path, so the boundary rule is a
        uniform inclusive ``d <= r`` (the reference's *documented*
        contract, ball_tree.rs:123-124).
        """
        q = check_query(point, self.dim, self.points.dtype)
        mask = bf.radius_mask(self._qpoints, self._q(q[None, :]), distance,
                              self.metric)
        return np.flatnonzero(np.asarray(mask[0])).astype(np.int64)

    # -- batched API (the TPU path) ----------------------------------------
    def query_batch(self, queries, k: int, *, chunk: int | None = None):
        qs = check_query_batch(queries, self.dim, self.points.dtype)
        k_eff = min(int(k), self.num_points)
        if (self._pallas_pts is not None
                and 1 <= k_eff <= 256 - bf.RESCORE_SLACK):
            try:
                d, i = bf.knn_pallas_prepadded(
                    self._pallas_pts, self._pallas_norms, qs,
                    k_eff, self.num_points, self._center,
                    pts_split=self._pallas_split)
                self.last_backend = "pallas"
                return d, i
            except Exception as exc:
                bf.warn_pallas_fallback(exc)
        d, i = bf.knn(self._qpoints, self._q(qs), k, self.metric,
                      chunk=chunk, point_norms=self.point_norms,
                      assume_centered=True, backend="xla")
        self.last_backend = "xla"
        return d, i

    def query_radius_count_batch(self, queries, distance, *,
                                 inclusive: bool = True):
        """Per-query neighbor counts only (no lists materialized)."""
        qs = check_query_batch(queries, self.dim, self.points.dtype)
        mask = bf.radius_mask(self._qpoints, self._q(qs), distance,
                              self.metric, inclusive=inclusive)
        return bf.radius_counts(mask)

    def query_radius_batch(self, queries, distance, *, cap: int | None = None,
                           inclusive: bool = True):
        """Batched radius search: (Q, n) mask, or (ids, counts) with ``cap``.

        ``inclusive`` selects the boundary rule: ``d <= r`` (default, the
        reference's documented contract, ball_tree.rs:123-124) or strict
        ``d < r`` (the reference's leaf-scan rule, ball_tree.rs:277 —
        DynamicIndex uses this for delta rows so semantics match the base
        tree's leaf path)."""
        qs = check_query_batch(queries, self.dim, self.points.dtype)
        mask = bf.radius_mask(self._qpoints, self._q(qs), distance,
                              self.metric, inclusive=inclusive)
        if cap is None:
            return mask
        return bf.compact_mask(mask, cap)
