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
from ..utils.validation import (check_points, check_points_host, check_query,
                                check_query_batch)

__all__ = ["BruteForce"]


class BruteForce:
    """Exact k-NN index backed by streamed MXU distance tiles."""

    #: skip the bf16 hi/lo split planes past this many elements (they cost
    #: one extra f32-sized HBM copy; GIST-1M at 960-d would OOM a 16 GB
    #: chip) — queries then run the kernel at "highest" precision
    SPLIT_BUDGET_ELEMS = 512 * (1 << 20)

    #: point-chunk tile of the Lp kernel (VMEM-bounded: the (tq, nb, d)
    #: difference block is the working set, not the score tile)
    LP_TILE_N = 512

    def __init__(self, points, metric: Metric | str = "euclidean"):
        self.metric = get_metric(metric)
        # The matmul distance form needs centered data for exactness
        # (ops.bruteforce.center_of) and index-resident squared norms;
        # both are paid once at build time.  Distances are unchanged
        # (translation invariance); low-dim paths use the direct form.
        self._center = None
        self.point_norms = None
        #: backend that served the most recent ``query_batch`` call
        #: ("pallas" | "xla" | None before the first query)
        self.last_backend = None
        # Pre-padded copies for the fused Pallas kernel (padding a large
        # corpus per query call costs an extra full-index HBM copy)
        self._pallas_pts = self._pallas_norms = self._pallas_split = None
        self._bcap_planes = None
        self._invalid = None
        #: cosine-through-the-Euclidean-kernel mode: the resident copy is
        #: L2-NORMALIZED (cosine distance = ‖q̂−x̂‖²/2 exactly), queries
        #: normalize inside the fused program, distances convert by /2.
        #: The XLA/radius fallbacks run Cosine.rdist on the normalized
        #: copy unchanged (cosine is scale-invariant; zeroed NaN/zero-norm
        #: rows give NaN -> +inf there, plus the invalid mask).
        self._cosine_kernel = False
        #: generic-metric (Lp/Chebyshev) fused-kernel state
        self._lp_pts = self._lp_mask = self._lp_spec = None
        from ..distance import DIRECT_DIM_MAX, Cosine
        from ..ops.pallas.lp_kernel import lp_spec_for
        probe = check_points_host(points)
        self.metric.validate_dim(probe.shape[1])
        high_dim = probe.shape[1] > DIRECT_DIM_MAX
        # Unlike bf.knn's per-call gate (which keeps low dim on the
        # direct XLA form to avoid a per-call full-corpus pad), the
        # index persists its kernel arrays — and the fused kernel beats
        # the XLA scan at EVERY dim once the corpus justifies a kernel
        # launch (round-5 receipt: 204.5k vs ~60k QPS at 100k x 2-d
        # 10k-q batches through the VP route, BENCH_NOTES session 2) —
        # so the Euclidean kernel branch takes any dim at n >= 4096
        from ..ops.pallas.knn_kernel import pallas_available as _pa
        pallas_ok = (type(self.metric) is Euclidean
                     and np.dtype(probe.dtype) == np.float32
                     and probe.shape[0] >= 4096 and _pa())
        cosine_kernel_ok = (
            type(self.metric) is Cosine and high_dim
            and bf._pallas_eligible(probe, probe[:1], 1, Euclidean()))
        lp_spec = lp_spec_for(self.metric)
        from ..ops.pallas.knn_kernel import pallas_available
        lp_kernel_ok = (lp_spec is not None and high_dim
                        and probe.shape[0] >= 4096
                        and np.dtype(probe.dtype) == np.float32
                        and pallas_available())
        if lp_kernel_ok:
            # Lp fused path (round-3): NaN-zeroed padded points + the
            # +inf exclusion mask are the only resident copies
            self.points = probe                    # public, original data
            (self._lp_pts, self._lp_mask,
             self._invalid) = bf.prepare_lp_index(probe, self.LP_TILE_N)
            self._lp_spec = lp_spec
            self._qpoints = None                   # lazy: _lp_pts[:n]
        elif cosine_kernel_ok:
            self.points = probe                    # public, original data
            n, d = probe.shape
            with_split = n * d <= self.SPLIT_BUDGET_ELEMS
            (self._pallas_pts, self._pallas_norms, self._pallas_split,
             self._invalid) = bf.prepare_cosine_index(
                probe, bf.pad_granule(d), with_split=with_split)
            self._qpoints = None                   # lazy: _pallas_pts[:n]
            self._cosine_kernel = True
        elif isinstance(self.metric, Euclidean) and pallas_ok:
            # HBM discipline for multi-GB corpora: the original stays on
            # host; only DERIVED device arrays are resident (padded
            # centered points + norms [+ bf16 planes under budget]); the
            # XLA/radius paths slice ppad[:n] on demand
            self.points = probe                    # public, original data
            n, d = probe.shape
            with_split = n * d <= self.SPLIT_BUDGET_ELEMS
            # block-interleaved planes for the bcap serving scheme: only
            # worth a resident copy at the scale where the scheme routes
            # (n >= 262144, see knn_pallas_prepadded), same HBM budget
            with_bcap = with_split and n >= 262144
            (self._center, self._pallas_pts, self._pallas_norms,
             self._pallas_split, self._invalid,
             self._bcap_planes) = bf.prepare_euclidean_index(
                probe, bf.pad_granule(d), with_split=with_split,
                with_bcap=with_bcap)
            self._qpoints = None                   # lazy: _pallas_pts[:n]
        else:
            self.points = check_points(points)     # public, original data
            self._qpoints = self.points            # what queries run against
            if isinstance(self.metric, Euclidean):
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

    def _xla_points(self):
        """Device points for the XLA/radius paths.  In kernel mode only
        the padded (centered / NaN-zeroed) copy is resident (HBM
        discipline) — slice it (a transient copy, paid only when these
        paths actually run).  NaN rows are zeroed there with +inf norms
        / an invalid mask, so the NaN-never-matches contract still holds
        on every path."""
        if self._qpoints is not None:
            return self._qpoints
        if self._lp_pts is not None:
            return self._lp_pts[:self.num_points]
        return self._pallas_pts[:self.num_points]

    def _xla_norms(self):
        if self._qpoints is not None:
            return self.point_norms
        if self._lp_pts is not None:
            return None
        return self._pallas_norms[:self.num_points]

    # -- single-query API (reference-shaped) ------------------------------
    def query_nearest(self, point):
        """(index, distance) of the nearest point (ball_tree.rs:80-87)."""
        q = check_query(point, self.dim, self.points.dtype)
        d, i = self.query_batch(q[None, :], 1)
        return int(i[0, 0]), float(d[0, 0])

    def query(self, point, k: int):
        """(indices, distances), ascending; k=0 -> empty; k>n -> n results
        (ball_tree.rs:102-121)."""
        q = check_query(point, self.dim, self.points.dtype)
        d, i = self.query_batch(q[None, :], k)
        return np.asarray(i[0]), np.asarray(d[0])

    def query_radius(self, point, distance):
        """Indices with distance <= ``distance`` (ball_tree.rs:123-142).

        The flat index has no subtree-take path, so the boundary rule is a
        uniform inclusive ``d <= r`` (the reference's *documented*
        contract, ball_tree.rs:123-124).
        """
        q = check_query(point, self.dim, self.points.dtype)
        mask = bf.radius_mask(self._xla_points(), self._q(q[None, :]),
                              distance, self.metric, invalid=self._invalid)
        return np.flatnonzero(np.asarray(mask[0])).astype(np.int64)

    # -- batched API (the TPU path) ----------------------------------------
    def query_batch(self, queries, k: int, *, chunk: int | None = None):
        qs = check_query_batch(queries, self.dim, self.points.dtype)
        k_eff = min(int(k), self.num_points)
        if self._lp_spec is not None and 1 <= k_eff <= 4096:
            try:
                d, i = bf.lp_knn_prepadded(
                    self._lp_pts, self._lp_mask, qs, k_eff,
                    self.num_points, spec=self._lp_spec,
                    metric=self.metric, tn=self.LP_TILE_N,
                    interpret=bf.FORCE_INTERPRET)
                self.last_backend = "pallas"
                return d, i
            except Exception as exc:
                bf.warn_pallas_fallback(exc)
        if (self._pallas_pts is not None
                and 1 <= k_eff <= bf.PALLAS_K_MAX):
            try:
                # no split planes (over SPLIT_BUDGET_ELEMS): query at
                # "highest" rather than re-deriving them per call
                prec = "high" if self._pallas_split is not None else "highest"
                from ..ops.pallas.knn_kernel import bcap_tile_n
                d, i = bf.knn_pallas_prepadded(
                    self._pallas_pts, self._pallas_norms, qs,
                    k_eff, self.num_points, self._center,
                    precision=prec, pts_split=self._pallas_split,
                    normalize_q=self._cosine_kernel,
                    out_rdist=self._cosine_kernel,
                    bcap_planes=self._bcap_planes,
                    bcap_tn=bcap_tile_n(self.dim))
                if self._cosine_kernel:
                    # ‖q̂−x̂‖²/2 == 1 − q̂·x̂ (exact algebra; /2 is a
                    # monotone exact f32 op, ascending preserved)
                    d = d * 0.5
                self.last_backend = "pallas"
                return d, i
            except Exception as exc:
                bf.warn_pallas_fallback(exc)
        d, i = bf.knn(self._xla_points(), self._q(qs), k, self.metric,
                      chunk=chunk, point_norms=self._xla_norms(),
                      assume_centered=True, backend="xla",
                      invalid=self._invalid)
        self.last_backend = "xla"
        return d, i

    def query_radius_count_batch(self, queries, distance, *,
                                 inclusive: bool = True):
        """Per-query neighbor counts only — one streamed scan, O(Q·chunk)
        memory, no (Q, n) mask (bf.radius_counts_streaming)."""
        qs = check_query_batch(queries, self.dim, self.points.dtype)
        return bf.radius_counts_streaming(
            self._xla_points(), self._q(qs), distance, self.metric,
            inclusive=inclusive, invalid=self._invalid)

    def query_radius_batch(self, queries, distance, *, cap: int | None = None,
                           inclusive: bool = True):
        """Batched radius search: (Q, n) mask, or (ids, counts) with ``cap``.

        The capped form streams (bf.radius_capped): O(Q·(chunk + cap))
        memory however large the corpus — counts stay exact past the cap
        (the enlarge-and-retry signal).  ``inclusive`` selects the
        boundary rule: ``d <= r`` (default, the reference's documented
        contract, ball_tree.rs:123-124) or strict ``d < r`` (the
        reference's leaf-scan rule, ball_tree.rs:277 — DynamicIndex uses
        this for delta rows so semantics match the base tree's leaf
        path)."""
        qs = check_query_batch(queries, self.dim, self.points.dtype)
        if cap is None:
            return bf.radius_mask(self._xla_points(), self._q(qs), distance,
                                  self.metric, inclusive=inclusive,
                                  invalid=self._invalid)
        return bf.radius_capped(self._xla_points(), self._q(qs), distance,
                                self.metric, cap=cap, inclusive=inclusive,
                                invalid=self._invalid)
