"""Batched dual-tree k-NN join over two ball trees.

The reference exposes public node accessors (``node_distance_lower_bound``,
``children_of``, ``points_of``, ... — ball_tree.rs:303-353) precisely so a
consumer (petal-clustering's HDBSCAN, CHANGELOG.md:70) can run a dual-tree
traversal: prune PAIRS of nodes with the two-ball bound
``max(d(c1, c2) - r1 - r2, 0)`` (ball_tree.rs:303-317) instead of
re-deriving per-query bounds point by point.

The TPU-native form replaces the recursive node-pair frontier with the
same flattening used by the single-tree engine (``ball_query.knn_query``):

* every LEAF PAIR bound comes from ONE centroid-matrix matmul
  (LA x LB — the whole "frontier" materialized at once);
* each A-leaf scans B-leaves best-first (ascending pair bound), a static
  chunk per lockstep step, merging its members' running top-k;
* an A-leaf stops when its next pair bound exceeds the leaf's group
  threshold (the max over its members' current k-th distances — if the
  bound beats the max, it beats every member's k-th, the reference's own
  prune test applied group-wise).

Exactness: a B-leaf is skipped for A-leaf ``a`` only when
``lb(a, b) > max_{p in a} kth(p) >= kth(p)`` for every member p — the
same hypersphere argument as ball_tree.rs:212-214 with both radii
subtracted; only visit ORDER differs from the recursive join.  Bounds are
deflated by a rounding slack so borderline pairs are never falsely
pruned; NaN bounds never prune; NaN member distances sort as farthest
(CHANGELOG.md:111-115).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..distance import Euclidean, Metric
from ..ops.topk import merge_topk, monotone_distances, nan_to_inf
from .ball_query import _bound_slack, _guarded_centroid_dist, _leaf_tables

__all__ = ["dual_tree_knn"]


def _leaf_row_of_pos(shape):
    """(n,) row index into the (LA, MA) leaf-grouped layout for each
    permuted position (host, static)."""
    node = np.asarray(shape.node_of_pos[shape.height - 1])
    leaf = node - shape.leaf_offset
    m = np.arange(shape.n) - shape.range_start[node]
    return (leaf * shape.max_leaf_points + m).astype(np.int32)


@partial(jax.jit, static_argnames=("k", "shape_a", "shape_b", "metric",
                                   "chunk"))
def _dual_knn(pts_a, pts_b, ca, ra, cb, rb, orig_b, row_of_pos_a,
              pos_of_id_a, center, *, k: int, shape_a, shape_b,
              metric: Metric, chunk: int = 4):
    """One jitted program: (distances, B ids), both (nA, k) ascending in
    ORIGINAL A point order.  ``pts_a``/``pts_b`` are the trees' permuted
    points; ``ca``/``ra``/``cb``/``rb`` the leaf ball geometry."""
    nA, dim = pts_a.shape
    nB = pts_b.shape[0]
    dtype = pts_a.dtype
    LA, MA = shape_a.n_leaves, shape_a.max_leaf_points
    LB, MB = shape_b.n_leaves, shape_b.max_leaf_points

    # --- leaf-pair bounds: the whole node-pair frontier in one matmul ---
    ca_c = ca if center is None else ca - center
    cb_c = cb if center is None else cb - center
    d_cc = _guarded_centroid_dist(ca_c, cb_c, metric)        # (LA, LB)
    lb = jnp.maximum(d_cc - ra[:, None] - rb[None, :], 0.0)
    lb = jnp.maximum(
        lb - _bound_slack(dtype) * (d_cc + ra[:, None] + rb[None, :]), 0.0)
    lb = jnp.where(jnp.isnan(lb), 0.0, lb)                   # NaN never prunes

    order = jnp.argsort(lb, axis=1).astype(jnp.int32)        # (LA, LB)
    lb_sorted = jnp.take_along_axis(lb, order, axis=1)

    C = max(1, min(chunk, LB))
    n_chunks = -(-LB // C)
    pad = n_chunks * C - LB
    if pad:
        order = jnp.pad(order, ((0, 0), (0, pad)), constant_values=LB)
        lb_sorted = jnp.pad(lb_sorted, ((0, 0), (0, pad)),
                            constant_values=jnp.inf)

    # --- leaf-grouped member points ---
    a_start, a_count = (jnp.asarray(x) for x in _leaf_tables(shape_a))
    b_start, b_count = (jnp.asarray(x) for x in _leaf_tables(shape_b))
    m_a = jnp.arange(MA, dtype=jnp.int32)
    m_b = jnp.arange(MB, dtype=jnp.int32)
    apos = a_start[:LA, None] + m_a[None, :]                 # (LA, MA)
    a_valid = m_a[None, :] < a_count[:LA, None]
    apts = pts_a[jnp.where(a_valid, apos, 0)]                # (LA, MA, d)

    def group_tau(best_rd):
        """Per-A-leaf stop threshold: max member k-th DISTANCE (invalid
        rows contribute -inf so padded members never block stopping)."""
        kth = metric.rdistance_to_distance(
            best_rd.reshape(LA, MA, k)[..., -1])
        return jnp.max(jnp.where(a_valid, kth, -jnp.inf), axis=1)  # (LA,)

    def cond(state):
        best_rd, _, ci = state
        nxt = jax.lax.dynamic_slice(lb_sorted, (jnp.int32(0), ci * C),
                                    (LA, 1))[:, 0]
        return (ci < n_chunks) & jnp.any(nxt <= group_tau(best_rd))

    def body(state):
        best_rd, best_pp, ci = state
        b_ids = jax.lax.dynamic_slice(order, (jnp.int32(0), ci * C),
                                      (LA, C))               # (LA, C)
        s = b_start[b_ids]
        cnt = b_count[b_ids]
        bpos = s[..., None] + m_b[None, None, :]             # (LA, C, MB)
        b_valid = m_b[None, None, :] < cnt[..., None]
        bpos = jnp.where(b_valid, bpos, 0)
        bpts = pts_b[bpos]                                   # (LA, C, MB, d)

        if isinstance(metric, Euclidean):
            # direct difference form: exact to rounding at any dim
            diff = apts[:, :, None, None, :] - bpts[:, None, :, :, :]
            rd = jnp.sum(diff * diff, axis=-1)               # (LA, MA, C, MB)
        else:
            flat_b = bpts.reshape(LA, C * MB, dim)
            rd = jax.vmap(metric.rdist)(apts, flat_b).reshape(LA, MA, C, MB)
        rd = jnp.where(b_valid[:, None], nan_to_inf(rd), jnp.inf)
        rd = rd.reshape(LA * MA, C * MB)
        pids = jnp.broadcast_to(
            jnp.where(b_valid, bpos, -1)[:, None], (LA, MA, C, MB)
        ).reshape(LA * MA, C * MB)

        best_rd, best_pp = merge_topk(rd, pids, best_rd, best_pp, k)
        return best_rd, best_pp, ci + 1

    init = (jnp.full((LA * MA, k), jnp.inf, dtype=dtype),
            jnp.full((LA * MA, k), -1, dtype=jnp.int32),
            jnp.int32(0))
    best_rd, best_pp, _ = jax.lax.while_loop(cond, body, init)

    # leaf-grouped rows -> permuted A order -> original A id order
    best_rd = best_rd[row_of_pos_a][pos_of_id_a]             # (nA, k)
    best_pp = best_pp[row_of_pos_a][pos_of_id_a]
    ids = jnp.where(best_pp >= 0, orig_b[jnp.maximum(best_pp, 0)], -1)
    return monotone_distances(metric.rdistance_to_distance(best_rd)), ids


def dual_tree_knn(tree_a, tree_b, k: int):
    """For every point of ``tree_a``, its ``k`` nearest neighbors among
    ``tree_b``'s points (ascending; ties by merge order).  Both arguments
    are built ``BallTree`` indexes over the SAME metric; a self-join
    (``tree_a is tree_b``) includes each point as its own 0-distance
    neighbor — HDBSCAN's core-distance convention.

    Returns ``(distances (nA, k_eff), ids (nA, k_eff))`` in ORIGINAL
    ``tree_a`` point order, ids indexing ``tree_b.points``;
    ``k_eff = min(k, nB)``; ``k = 0`` gives empty arrays.
    """
    if type(tree_a.metric) is not type(tree_b.metric) \
            or tree_a.metric != tree_b.metric:
        raise ValueError("dual_tree_knn requires both trees to share one "
                         f"metric, got {tree_a.metric!r} vs {tree_b.metric!r}")
    if tree_a.dim != tree_b.dim:
        raise ValueError(f"dimension mismatch: {tree_a.dim} vs {tree_b.dim}")
    k_eff = min(int(k), tree_b.points.shape[0])
    nA = tree_a.points.shape[0]
    if k_eff == 0:
        return (jnp.zeros((nA, 0), dtype=tree_a.points.dtype),
                jnp.zeros((nA, 0), dtype=jnp.int32))
    row_of_pos = jnp.asarray(_leaf_row_of_pos(tree_a._shape))
    # centering (translation-invariant exactness fix) only affects the
    # matmul-form centroid bounds; member distances use the direct form
    center = tree_a._qcenter
    return _dual_knn(
        tree_a._points_perm, tree_b._points_perm,
        tree_a._leaf_centroids, tree_a._leaf_radii,
        tree_b._leaf_centroids, tree_b._leaf_radii,
        tree_b._orig_ids, row_of_pos, tree_a._pos_of_id, center,
        k=k_eff, shape_a=tree_a._shape, shape_b=tree_b._shape,
        metric=tree_a.metric)
