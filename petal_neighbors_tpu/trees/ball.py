"""BallTree — the central index (parity: ball_tree.rs:15-374).

Flat SoA layout on device: ``centroids (n_nodes, d)``, ``radii (n_nodes,)``,
the ``idx`` permutation, and the points re-ordered by ``idx`` so every
node's members are one contiguous row-range (the reference's layout,
ball_tree.rs:15-24, already TPU-friendly).  Node ranges / leaf flags are
static host metadata (``TreeShape``).

Reference API surface replicated: ``new``/``euclidean`` constructors with
Empty/NotContiguous validation, ``query_nearest``, ``query`` (k=0 -> empty,
k>n -> n results, ascending sort), ``query_radius`` (inclusive subtree
take, strict leaf filter), and the dual-tree node accessors consumed by
petal-clustering (``node_distance_lower_bound``, ``children_of``,
``points_of``, ``radius_of``, ``compare_nodes``, ``num_nodes``,
``num_points`` — ball_tree.rs:303-353).

TPU extensions: batched ``query_batch`` / ``query_radius_batch``,
configurable ``leaf_size`` (TPU tiling wants 128-256, not the reference's
1-2), and selectable builders.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..distance import Euclidean, Metric, get_metric
from ..utils.tree_math import TreeShape, tree_shape
from ..utils.validation import check_points, check_query, check_query_batch
from . import ball_build, ball_query
from .ball_build import BallTreeData

__all__ = ["BallTree", "Node", "NodeTable"]


class Node:
    """View of one tree node (parity with ``Node`` fields,
    ball_tree.rs:427-432: range, centroid, radius, is_leaf)."""

    __slots__ = ("range", "centroid", "radius", "is_leaf")

    def __init__(self, range_, centroid, radius, is_leaf):
        self.range = range_
        self.centroid = centroid
        self.radius = radius
        self.is_leaf = is_leaf

    def __repr__(self):
        return (f"Node(range={self.range}, radius={self.radius:.6g}, "
                f"is_leaf={self.is_leaf})")


class NodeTable:
    """SoA node array with reference-style per-node access."""

    def __init__(self, centroids, radii, shape: TreeShape):
        self.centroids = centroids          # (n_nodes, d) device array
        self.radii = radii                  # (n_nodes,)
        self.shape = shape

    def __len__(self):
        return self.shape.n_nodes

    def __getitem__(self, i: int) -> Node:
        if not 0 <= i < len(self):
            raise IndexError(i)
        return Node(
            range_=range(int(self.shape.range_start[i]),
                         int(self.shape.range_end[i])),
            centroid=np.asarray(self.centroids[i]),
            radius=float(self.radii[i]),
            is_leaf=bool(self.shape.is_leaf[i]),
        )


class BallTree:
    """Exact metric ball-tree index over a dense points matrix."""

    def __init__(self, points, metric: Metric | str = "euclidean", *,
                 leaf_size: int | None = 128, builder: str = "auto"):
        """Build the tree (reference ``BallTree::new``, ball_tree.rs:38-63).

        Args:
          points: (n, d) float matrix (NumPy or JAX). Raises
            ``EmptyArrayError`` / ``NotContiguousError`` like the reference.
          metric: a ``Metric`` or registry name.
          leaf_size: max points per leaf. ``None`` reproduces the
            reference's sizing exactly (1-2 points/leaf,
            ball_tree.rs:51-52); the default 128 is the TPU-friendly
            setting (results identical, speed differs).
          builder: ``"auto"`` (default: the on-device builder for large
            corpora on an accelerator — measured 43x the host build at
            1M points — else the host build), ``"vectorized"``
            (level-synchronous host build), ``"device"`` (the same
            algorithm as one jitted XLA program — segment reductions +
            per-level two-key sort), or ``"reference"`` (exact reference
            idx permutation incl. tie order — quickselect semantics of
            ball_tree.rs:545-569).
        """
        self.metric = get_metric(metric)
        if not self.metric.tree_compatible:
            raise ValueError(
                f"metric {self.metric.name!r} violates the triangle "
                "inequality, so ball-tree pruning bounds are invalid; "
                "use BruteForce for this metric")
        self.points = check_points(points)
        n = self.points.shape[0]
        self.metric.validate_dim(self.points.shape[1])
        self._leaf_size = leaf_size
        self._shape = tree_shape(n, leaf_size)

        if builder == "auto":
            from ._auto import use_device_build
            builder = "device" if use_device_build(n) else "vectorized" 
        if builder == "device":
            from . import ball_build_device
            data = ball_build_device.build_device(self.points, self._shape,
                                                  self.metric)
        else:
            host_pts = np.asarray(self.points)
            if builder == "reference":
                # prefer the native (C++) builder: identical semantics,
                # no Python-level quickselect loops
                from .. import native
                nat = None
                try:
                    nat = native.ball_build(host_pts, self._shape.n_nodes,
                                            self.metric)
                except ValueError:
                    nat = None  # metric unsupported natively
                if nat is not None:
                    c, r, idx = nat
                    data = BallTreeData(centroids=c, radii=r, idx=idx,
                                        shape=self._shape)
                else:
                    data = ball_build.build_reference_order(
                        host_pts, self._shape, self.metric)
            elif builder == "vectorized":
                data = ball_build.build_host_vectorized(host_pts, self._shape,
                                                        self.metric)
            else:
                raise ValueError(f"unknown builder {builder!r}")
        self._init_from_data(data)

    def _init_from_data(self, data: BallTreeData) -> None:
        self.idx = np.asarray(data.idx, dtype=np.int64)      # public field
        self.nodes = NodeTable(jnp.asarray(data.centroids),
                               jnp.asarray(data.radii), data.shape)
        # device-resident query state
        self._centroids = self.nodes.centroids
        self._radii = self.nodes.radii
        self._points_perm = self.points[jnp.asarray(self.idx)]
        self._orig_ids = jnp.asarray(self.idx, dtype=jnp.int32)
        inv = np.empty_like(self.idx)
        inv[self.idx] = np.arange(len(self.idx))
        self._pos_of_id = jnp.asarray(inv, dtype=jnp.int32)
        if isinstance(self.metric, Euclidean):
            # matmul-form computations run on centered values for
            # exactness (ops.bruteforce.center_of); norms match that
            from ..ops.bruteforce import center_of
            self._qcenter = center_of(self.points)
            centered = self._points_perm - self._qcenter
            self._perm_norms = jnp.sum(centered * centered, axis=-1)
        else:
            self._qcenter = None
            self._perm_norms = None
        lo = self._shape.leaf_offset
        self._leaf_centroids = self._centroids[lo:]
        self._leaf_radii = self._radii[lo:]

    @classmethod
    def euclidean(cls, points, **kwargs) -> "BallTree":
        """Convenience constructor (ball_tree.rs:356-374)."""
        return cls(points, Euclidean(), **kwargs)

    @classmethod
    def _from_arrays(cls, points, metric, leaf_size, centroids, radii, idx):
        """Rehydrate from serialized arrays (utils.serialize) — no rebuild."""
        self = cls.__new__(cls)
        self.metric = get_metric(metric)
        self.points = check_points(points)
        self._leaf_size = leaf_size
        self._shape = tree_shape(self.points.shape[0], leaf_size)
        self._init_from_data(BallTreeData(
            centroids=np.asarray(centroids), radii=np.asarray(radii),
            idx=np.asarray(idx), shape=self._shape))
        return self

    def save(self, path) -> None:
        """Checkpoint the index to an ``.npz`` (see utils.serialize)."""
        from ..utils.serialize import save_index
        save_index(self, path)

    # ------------------------------------------------------------------
    # single-query API (reference-shaped; ball_tree.rs:80-142)
    # ------------------------------------------------------------------
    def query_nearest(self, point):
        """(index, distance) of the nearest point (ball_tree.rs:80-87)."""
        q = check_query(point, self.dim, self.points.dtype)
        d, i = self._knn(q[None, :], 1)
        return int(i[0, 0]), float(d[0, 0])

    def query(self, point, k: int):
        """k nearest: (indices, distances) ascending (ball_tree.rs:102-121).
        k=0 returns empty; k>n returns n results."""
        q = check_query(point, self.dim, self.points.dtype)
        k_eff = min(int(k), self.n)
        if k_eff == 0:
            return (np.zeros(0, dtype=np.int64),
                    np.zeros(0, dtype=np.asarray(self.points).dtype))
        d, i = self._knn(q[None, :], k_eff)
        return np.asarray(i[0]).astype(np.int64), np.asarray(d[0])

    def query_radius(self, point, distance):
        """All indices within ``distance`` (ball_tree.rs:123-142).

        Boundary semantics replicate the reference exactly: points covered
        by a wholly-contained node are taken inclusively (ub <= r) without
        distance evaluation; leaf-scanned points use strict d < r
        (ball_tree.rs:271-277). Order is unspecified (the reference returns
        traversal order; its own tests sort)."""
        q = check_query(point, self.dim, self.points.dtype)
        mask = self._radius_mask(q[None, :], distance)
        return np.flatnonzero(np.asarray(mask[0])).astype(np.int64)

    # ------------------------------------------------------------------
    # batched API (the TPU path)
    # ------------------------------------------------------------------
    def query_batch(self, queries, k: int, *, chunk_leaves: int = 4,
                    with_stats: bool = False, scheme: str = "auto"):
        """Exact batched k-NN: (distances, indices), each (Q, min(k, n)).

        ``scheme``: "auto" picks the TILE-SHARED leaf frontier
        (``ball_query.knn_query_tiled`` — queries locality-sorted, each
        tile sharing one leaf visit order, min-extraction merge) for
        low-dim small-k large batches, else the per-query best-first
        scan; "per_query" / "tiled" force one.

        ``with_stats=True`` additionally returns an observability dict
        (SURVEY.md §5): chunks processed, per-query surviving-leaf counts,
        prune ratios — the perf-debugging tool for lockstep traversal.
        """
        qs = check_query_batch(queries, self.dim, self.points.dtype)
        k_eff = min(int(k), self.n)
        if k_eff == 0:
            empty = (jnp.zeros((qs.shape[0], 0), dtype=self.points.dtype),
                     jnp.zeros((qs.shape[0], 0), dtype=jnp.int32))
            return (*empty, {}) if with_stats else empty
        if scheme not in ("auto", "per_query", "tiled"):
            raise ValueError(f"unknown scheme {scheme!r}")
        if scheme == "auto":
            from ..distance import DIRECT_DIM_MAX
            # tiled wins when leaves are shared between neighboring
            # queries and the min-extraction merge is cheap: low dim
            # (direct-form distances, no rescore machinery needed),
            # small k, batch large enough to fill tiles
            scheme = ("tiled" if (self.dim <= 32 and k_eff <= 16
                                  and qs.shape[0] >= 512
                                  and isinstance(self.metric, Euclidean))
                      else "per_query")
        if scheme == "tiled":
            return ball_query.knn_query_tiled(
                self._points_perm, self._perm_norms, self._orig_ids,
                self._leaf_centroids, self._leaf_radii, qs, self._qcenter,
                k=k_eff, shape=self._shape, metric=self.metric,
                chunk_leaves=chunk_leaves, with_stats=with_stats)
        return self._knn(qs, k_eff, chunk_leaves=chunk_leaves,
                         with_stats=with_stats)

    def query_nearest_batch(self, queries):
        d, i = self.query_batch(queries, 1)
        return i[:, 0], d[:, 0]

    def query_radius_batch(self, queries, distance, *, cap: int | None = None,
                           scheme: str = "auto"):
        """Batched radius search. Returns a (Q, n) boolean mask (original
        id order), or ``(indices (Q, cap), counts)`` when ``cap`` is set —
        the masked-segment-output scheme for variable-length results.

        The capped form is tree-pruned: it gathers only the leaves each
        query's traversal reaches (the DBSCAN regime), instead of the
        dense full-corpus sweep behind the mask form.  Index order within
        a row is unspecified (the reference returns traversal order too).

        ``scheme`` (capped form only): "auto" picks the TILE-SHARED leaf
        frontier (queries locality-sorted, each tile visiting the union
        of its members' emitted leaves — the round-3 config1 trick ported
        to radius) for low-dim large batches, else the per-query lockstep
        scan; "per_query" / "tiled" force one.
        """
        qs = check_query_batch(queries, self.dim, self.points.dtype)
        if cap is None:
            return self._radius_mask(qs, distance)
        if scheme not in ("auto", "per_query", "tiled"):
            raise ValueError(f"unknown scheme {scheme!r}")
        from ..ops.bruteforce import _pick_chunk
        chunk = _pick_chunk(self.n, qs.shape[0], self.dim, None, direct=True)
        if scheme == "auto":
            scheme = ("tiled" if (self.dim <= 32 and qs.shape[0] >= 512
                                  and isinstance(self.metric, Euclidean))
                      else "per_query")
        if scheme == "tiled":
            return ball_query.radius_query_capped_tiled(
                self._points_perm, self._orig_ids, self._centroids,
                self._radii, qs, distance, shape=self._shape,
                metric=self.metric, cap=cap, point_chunk=chunk)
        return ball_query.radius_query_capped(
            self._points_perm, self._orig_ids, self._centroids, self._radii,
            qs, distance, shape=self._shape, metric=self.metric, cap=cap,
            point_chunk=chunk)

    def query_radius_count_batch(self, queries, distance):
        """Per-query neighbor counts only (the DBSCAN core-point test) —
        tree-pruned, no neighbor lists fetched.  The capped kernel's
        counts are exact regardless of cap, so cap=1 gives pure counts."""
        qs = check_query_batch(queries, self.dim, self.points.dtype)
        from ..ops.bruteforce import _pick_chunk
        chunk = _pick_chunk(self.n, qs.shape[0], self.dim, None, direct=True)
        _, counts = ball_query.radius_query_capped(
            self._points_perm, self._orig_ids, self._centroids, self._radii,
            qs, distance, shape=self._shape, metric=self.metric, cap=1,
            point_chunk=chunk)
        return counts

    def _knn(self, qs, k_eff: int, chunk_leaves: int = 4,
             with_stats: bool = False):
        return ball_query.knn_query(
            self._points_perm, self._perm_norms, self._orig_ids,
            self._leaf_centroids, self._leaf_radii, qs, self._qcenter,
            k=k_eff, shape=self._shape, metric=self.metric,
            chunk_leaves=chunk_leaves, with_stats=with_stats)

    def _radius_mask(self, qs, distance):
        from ..ops.bruteforce import _pick_chunk
        # the radius path uses the direct difference form at every dim
        chunk = _pick_chunk(self.n, qs.shape[0], self.dim, None, direct=True)
        return ball_query.radius_query_mask(
            self._points_perm, self._pos_of_id, self._centroids, self._radii,
            qs, distance, shape=self._shape, metric=self.metric,
            point_chunk=chunk)

    # ------------------------------------------------------------------
    # dual-tree node accessors (petal-clustering HDBSCAN consumers;
    # ball_tree.rs:303-353)
    # ------------------------------------------------------------------
    def node_distance_lower_bound(self, n1: int, n2: int) -> float:
        """max(d(c1, c2) - r1 - r2, 0) (ball_tree.rs:303-317)."""
        nn = self._shape.n_nodes
        if not (0 <= n1 < nn and 0 <= n2 < nn):
            raise IndexError("node index out of range")
        d = float(self.metric.rowwise_dist(self._centroids[n1][None, :],
                                           self._centroids[n2][None, :])[0])
        lb = d - float(self._radii[n1]) - float(self._radii[n2])
        return max(lb, 0.0)

    def children_of(self, n: int):
        """(left, right) ids, or None for a leaf (ball_tree.rs:320-328)."""
        if self._shape.is_leaf[n]:
            return None
        return 2 * n + 1, 2 * n + 2

    def points_of(self, n: int) -> np.ndarray:
        """Original point ids owned by node ``n`` (ball_tree.rs:331-333)."""
        s, e = self._shape.range_start[n], self._shape.range_end[n]
        return self.idx[s:e]

    def radius_of(self, n: int) -> float:
        return float(self._radii[n])

    def compare_nodes(self, x: int, y: int):
        """Ordering of node radii: -1/0/+1, or None if incomparable (NaN)
        (ball_tree.rs:341-343 partial_cmp semantics)."""
        rx, ry = float(self._radii[x]), float(self._radii[y])
        if np.isnan(rx) or np.isnan(ry):
            return None
        return (rx > ry) - (rx < ry)

    def num_nodes(self) -> int:
        return self._shape.n_nodes

    def query_tree(self, other: "BallTree", k: int):
        """Dual-tree k-NN join: for every point of ``self``, the ``k``
        nearest points of ``other`` (the batched device-side form of the
        node-pair traversal the accessors above enable — see
        ``trees.dual.dual_tree_knn``).  ``self.query_tree(self, k)`` is
        the all-k-NN self-join (HDBSCAN core distances)."""
        from .dual import dual_tree_knn
        return dual_tree_knn(self, other, k)

    def num_points(self) -> int:
        return self.points.shape[0]

    @property
    def n(self) -> int:
        return self.points.shape[0]

    @property
    def dim(self) -> int:
        return self.points.shape[1]

    @property
    def shape(self) -> TreeShape:
        return self._shape
