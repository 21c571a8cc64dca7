"""Batched ball-tree query kernels (JAX).

The reference's pointer-chasing branch-and-bound with a binary heap
(ball_tree.rs:149-294) becomes two lockstep, fixed-shape batched schemes:

* **k-NN / 1-NN** — *best-first chunked leaf scan*: one MXU matmul
  computes every query's lower bound to every leaf ball; leaves are
  processed per query in ascending-lower-bound order, a static chunk at a
  time, merging into a running top-k; the loop stops when every query's
  next lower bound exceeds its current k-th distance.  Exact by the same
  hypersphere-bound argument as the reference (prune only when
  lb > kth-best, ball_tree.rs:212-214); only the *visit order* differs,
  which cannot change the result set.

* **radius** — *mask algebra over the whole node table*: bounds for all
  nodes in one matmul, the traversal-reachability recurrence evaluated
  level-by-level (log n vectorized steps), then per-point membership =
  "some reached ancestor was wholly inside" OR "leaf scanned AND d < r".
  This reproduces the reference's exact boundary semantics: whole-subtree
  take is inclusive ``ub <= r`` while the leaf filter is strict ``d < r``
  (ball_tree.rs:271-277).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..distance import DIRECT_DIM_MAX, Euclidean, Metric
from ..ops.topk import (merge_topk, monotone_distances, nan_to_inf,
                        rescore_exact)
from ..utils.tree_math import TreeShape

__all__ = ["knn_query", "radius_query_mask", "radius_query_capped",
           "radius_query_capped_tiled"]


def _bound_slack(dtype) -> float:
    """Relative slack subtracted from lower bounds so floating-point
    rounding in the matmul path can never cause a false prune."""
    return 4e-6 if np.dtype(dtype) == np.float32 else 1e-13


def _guarded_centroid_dist(queries, centroids, metric: Metric):
    """Centroid distances for PRUNING BOUNDS: always the MXU matmul form,
    deflated by an explicit rounding-error bound so the result is a valid
    LOWER bound on the true distance.

    Bounds don't need exact distances — they need `lb <= true distance`.
    The ||q||^2+||c||^2-2qc form loses absolute accuracy ~eps*(|q|^2+|c|^2)
    to cancellation; subtracting that bound (in the rdist domain) before
    the sqrt restores validity while keeping the (Q, L) matrix on the MXU
    — the broadcast (Q, L, d) difference form is pathologically tiled on
    TPU at small d (last dim << 128 lanes).
    """
    if not isinstance(metric, Euclidean):
        return metric.rdistance_to_distance(metric.rdist(queries, centroids))
    q = jnp.asarray(queries)
    c = jnp.asarray(centroids)
    qn = jnp.sum(q * q, axis=-1)
    cn = jnp.sum(c * c, axis=-1)
    cross = jnp.dot(q, c.T, precision=jax.lax.Precision.HIGHEST)
    rd = qn[:, None] + cn[None, :] - 2.0 * cross
    eps = jnp.finfo(q.dtype).eps
    guard = 4.0 * eps * (qn[:, None] + cn[None, :])
    return jnp.sqrt(jnp.maximum(rd - guard, 0.0))


def _leaf_tables(shape: TreeShape):
    """Static leaf geometry (+1 sentinel row for chunk padding)."""
    lo = shape.n_leaves - 1
    starts = shape.range_start[lo:]
    counts = shape.range_end[lo:] - starts
    starts = np.concatenate([starts, [0]]).astype(np.int32)
    counts = np.concatenate([counts, [0]]).astype(np.int32)
    return starts, counts


@partial(jax.jit, static_argnames=("k", "shape", "chunk_leaves", "metric",
                                   "with_stats"))
def knn_query(points_perm, perm_norms, orig_ids, leaf_centroids, leaf_radii,
              queries, center=None, *, k: int, shape: TreeShape,
              metric: Metric, chunk_leaves: int = 4,
              with_stats: bool = False):
    """Exact batched k-NN over a built ball tree.

    Args:
      points_perm: (n, d) points in tree (idx) order (original values).
      perm_norms: (n,) squared norms of the CENTERED permuted points
        (Euclidean) or None.
      orig_ids: (n,) original point id at each permuted position.
      leaf_centroids / leaf_radii: (L, d) / (L,) leaf-ball geometry.
      queries: (Q, d).
      center: (d,) dataset mean or None — every matmul-form computation
        (bounds, high-dim leaf scan) runs on centered values for
        exactness (see ops.bruteforce.center_of); the final rescore uses
        the original values.
      k: static; caller guarantees 1 <= k <= n.

    Returns (distances, indices): (Q, k) ascending, exact.
    """
    n, dim = points_perm.shape
    q = queries.shape[0]
    L = shape.n_leaves
    max_leaf = shape.max_leaf_points
    dtype = points_perm.dtype
    qc = queries if center is None else queries - center
    lc = leaf_centroids if center is None else leaf_centroids - center

    # --- Phase 1: bounds to every leaf ball, one MXU matmul --------------
    d_c = _guarded_centroid_dist(qc, lc, metric)
    lb = jnp.maximum(d_c - leaf_radii[None, :], 0.0)        # (Q, L)
    lb = jnp.maximum(lb - _bound_slack(dtype) * (d_c + leaf_radii[None, :]), 0.0)
    # NaN bounds never prune in the reference (NaN > r is false,
    # ball_tree.rs:212-214) — force those leaves to be visited.
    lb = jnp.where(jnp.isnan(lb), 0.0, lb)

    order = jnp.argsort(lb, axis=1).astype(jnp.int32)       # (Q, L) best-first
    lb_sorted = jnp.take_along_axis(lb, order, axis=1)

    # pad to whole chunks with the sentinel leaf (id L: start 0, count 0)
    C = max(1, min(chunk_leaves, L))
    n_chunks = -(-L // C)
    pad = n_chunks * C - L
    if pad:
        order = jnp.pad(order, ((0, 0), (0, pad)), constant_values=L)
        lb_sorted = jnp.pad(lb_sorted, ((0, 0), (0, pad)),
                            constant_values=jnp.inf)

    starts_np, counts_np = _leaf_tables(shape)
    leaf_start = jnp.asarray(starts_np)
    leaf_count = jnp.asarray(counts_np)

    use_norms = isinstance(metric, Euclidean) and perm_norms is not None
    if use_norms:
        qn = jnp.sum(qc * qc, axis=-1)                      # (Q,) centered

    m_ar = jnp.arange(max_leaf, dtype=jnp.int32)

    def kth_dist(best_rd):
        return metric.rdistance_to_distance(best_rd[:, -1])

    def cond(state):
        best_rd, _, ci = state
        next_lb = jax.lax.dynamic_slice(lb_sorted, (jnp.int32(0), ci * C), (q, 1))[:, 0]
        return (ci < n_chunks) & jnp.any(next_lb <= kth_dist(best_rd))

    def body(state):
        best_rd, best_ii, ci = state
        leaf_ids = jax.lax.dynamic_slice(order, (jnp.int32(0), ci * C), (q, C))  # (Q,C)
        s = leaf_start[leaf_ids]                                       # (Q,C)
        cnt = leaf_count[leaf_ids]
        pos = s[..., None] + m_ar[None, None, :]                       # (Q,C,M)
        valid = m_ar[None, None, :] < cnt[..., None]
        pos = jnp.where(valid, pos, 0)

        pts = points_perm[pos]                                         # (Q,C,M,d)
        if isinstance(metric, Euclidean) and dim <= DIRECT_DIM_MAX:
            # direct form: exact to rounding, and faster than a K<=32
            # matmul (see distance.DIRECT_DIM_MAX)
            diff = pts - queries[:, None, None, :]
            rd = jnp.sum(diff * diff, axis=-1)
        elif use_norms:
            # matmul form on CENTERED values (perm_norms are centered)
            pts_c = pts if center is None else pts - center
            cross = jnp.einsum("qd,qcmd->qcm", qc, pts_c,
                               precision=jax.lax.Precision.HIGHEST)
            rd = jnp.maximum(
                qn[:, None, None] + perm_norms[pos] - 2.0 * cross, 0.0)
        else:
            flat = pts.reshape(q, C * max_leaf, dim)
            rd = jax.vmap(lambda qq, xx: metric.rdist(qq[None], xx)[0])(
                queries, flat).reshape(q, C, max_leaf)
        rd = jnp.where(valid, nan_to_inf(rd), jnp.inf).reshape(q, C * max_leaf)
        # carry permuted positions; mapped to original ids at the end
        pids = jnp.where(valid, pos, -1).reshape(q, C * max_leaf)

        best_rd, best_ii = merge_topk(rd, pids, best_rd, best_ii, k_scan)
        return best_rd, best_ii, ci + 1

    # High-dim Euclidean: the matmul form loses accuracy by cancellation at
    # tiny distances, so keep a small candidate slack and re-score exactly
    # with the direct form after the loop (same scheme as ops.bruteforce).
    do_rescore = isinstance(metric, Euclidean) and dim > DIRECT_DIM_MAX
    k_scan = min(k + 8, n) if do_rescore else k

    init = (jnp.full((q, k_scan), jnp.inf, dtype=dtype),
            jnp.full((q, k_scan), -1, dtype=jnp.int32),
            jnp.int32(0))
    best_rd, best_pos, chunks_done = jax.lax.while_loop(cond, body, init)

    if do_rescore:
        # exact rescore on the ORIGINAL (uncentered) values
        best_rd, best_pos = rescore_exact(points_perm, queries, best_pos, k)

    best_ii = jnp.where(best_pos >= 0, orig_ids[jnp.maximum(best_pos, 0)], -1)
    dists = monotone_distances(metric.rdistance_to_distance(best_rd))
    if not with_stats:
        return dists, best_ii
    # observability (SURVEY.md §5): per-query pruning effectiveness
    kth = dists[:, -1]
    surviving = jnp.sum(lb <= kth[:, None], axis=1)     # leaves not prunable
    stats = {
        "n_leaves": jnp.int32(L),
        "loop_chunks": chunks_done,                     # chunks processed
        "chunk_leaves": jnp.int32(C),
        "leaves_surviving_final_bound": surviving.astype(jnp.int32),
        "prune_ratio": 1.0 - surviving / L,
    }
    return dists, best_ii, stats


def _merge_small_k(rd, ids, best_rd, best_ii, k: int):
    """Merge new candidates into the running top-k by k-pass
    min-extraction instead of ``lax.top_k`` — pure elementwise min/argmin
    that XLA fuses, avoiding the TopK custom call that dominated the
    leaf-scan loop at tiny k (config1 is k=2)."""
    d = jnp.concatenate([rd, best_rd], axis=-1)
    i = jnp.concatenate([ids, best_ii], axis=-1)
    w = d.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    out_d = []
    out_i = []
    for _ in range(k):
        m = jnp.min(d, axis=-1)
        am = jnp.argmin(d, axis=-1).astype(jnp.int32)
        out_d.append(m)
        out_i.append(jnp.take_along_axis(i, am[..., None], axis=-1)[..., 0])
        d = jnp.where(col == am[..., None], jnp.inf, d)
    return jnp.stack(out_d, axis=-1), jnp.stack(out_i, axis=-1)


@partial(jax.jit, static_argnames=("k", "shape", "chunk_leaves", "metric",
                                   "tile_q", "with_stats"))
def knn_query_tiled(points_perm, perm_norms, orig_ids, leaf_centroids,
                    leaf_radii, queries, center=None, *, k: int,
                    shape: TreeShape, metric: Metric,
                    chunk_leaves: int = 4, tile_q: int = 256,
                    with_stats: bool = False):
    """Exact batched k-NN with a TILE-SHARED leaf frontier (round-3
    redesign of the lockstep leaf scan for low-dim workloads).

    The per-query scheme (``knn_query``) gathers each query's own next
    leaves: a (Q, C, M, d) gather from HBM per loop step — 40 MB/step at
    the config1 shape, repeated for the lockstep maximum of steps.  Here
    queries are first SORTED BY LOCALITY (by their best-bound leaf id),
    then each tile of ``tile_q`` neighbors shares ONE leaf visit order
    (ascending min-over-tile lower bound): the gather shrinks to
    (T, C, M, d) — a factor tile_q less data — and every gathered leaf
    is reused by all tile_q queries while it sits in registers/VMEM.

    Exactness: the loop stops only when, for every query, the next
    shared leaf's TILE bound exceeds its k-th distance; the tile bound
    is a min over the tile, hence <= the query's own bound, so every
    leaf the reference traversal would scan is scanned (the same
    prune-only-when-lb-exceeds-kth argument, ball_tree.rs:212-214; only
    visit order and wasted visits differ).  Results are re-permuted to
    the caller's query order.

    The top-k merge is k-pass min-extraction (``_merge_small_k``), not
    ``lax.top_k`` — intended for small k (<= ~16); callers route large k
    to ``knn_query``.
    """
    n, dim = points_perm.shape
    q = queries.shape[0]
    L = shape.n_leaves
    max_leaf = shape.max_leaf_points
    dtype = points_perm.dtype
    qc = queries if center is None else queries - center
    lc = leaf_centroids if center is None else leaf_centroids - center

    # --- bounds to every leaf ball (one matmul), as in knn_query --------
    d_c = _guarded_centroid_dist(qc, lc, metric)
    lb = jnp.maximum(d_c - leaf_radii[None, :], 0.0)
    lb = jnp.maximum(lb - _bound_slack(dtype) * (d_c + leaf_radii[None, :]),
                     0.0)
    lb = jnp.where(jnp.isnan(lb), 0.0, lb)

    # --- locality sort: group queries by their best leaf ----------------
    tq = max(1, min(tile_q, q))
    T = -(-q // tq)
    qpad = T * tq - q
    best_leaf = jnp.argmin(lb, axis=1).astype(jnp.int32)
    qorder = jnp.argsort(best_leaf, stable=True).astype(jnp.int32)
    if qpad:
        # pad with repeats of the last query: harmless extra work
        qorder = jnp.concatenate(
            [qorder, jnp.broadcast_to(qorder[-1:], (qpad,))])
    qs_s = queries[qorder]                                    # (T*tq, d)
    lb_s = lb[qorder].reshape(T, tq, L)
    lb_tile = jnp.min(lb_s, axis=1)                           # (T, L)

    order_t = jnp.argsort(lb_tile, axis=1).astype(jnp.int32)  # (T, L)
    lbt_sorted = jnp.take_along_axis(lb_tile, order_t, axis=1)

    C = max(1, min(chunk_leaves, L))
    n_chunks = -(-L // C)
    pad = n_chunks * C - L
    if pad:
        order_t = jnp.pad(order_t, ((0, 0), (0, pad)), constant_values=L)
        lbt_sorted = jnp.pad(lbt_sorted, ((0, 0), (0, pad)),
                             constant_values=jnp.inf)

    starts_np, counts_np = _leaf_tables(shape)
    leaf_start = jnp.asarray(starts_np)
    leaf_count = jnp.asarray(counts_np)
    m_ar = jnp.arange(max_leaf, dtype=jnp.int32)
    qs_t = qs_s.reshape(T, tq, dim)

    def kth_dist(best_rd):
        return metric.rdistance_to_distance(best_rd[..., -1])  # (T, tq)

    def cond(state):
        best_rd, _, ci = state
        nxt = jax.lax.dynamic_slice(lbt_sorted, (jnp.int32(0), ci * C),
                                    (T, 1))[:, 0]              # (T,)
        return (ci < n_chunks) & jnp.any(
            nxt[:, None] <= kth_dist(best_rd))

    def body(state):
        best_rd, best_ii, ci = state
        leaf_ids = jax.lax.dynamic_slice(order_t, (jnp.int32(0), ci * C),
                                         (T, C))               # (T, C)
        s = leaf_start[leaf_ids]
        cnt = leaf_count[leaf_ids]
        pos = s[..., None] + m_ar[None, None, :]               # (T, C, M)
        valid = m_ar[None, None, :] < cnt[..., None]
        pos = jnp.where(valid, pos, 0)
        pts = points_perm[pos]                                 # (T, C, M, d)
        if isinstance(metric, Euclidean) and dim <= DIRECT_DIM_MAX:
            diff = pts[:, None] - qs_t[:, :, None, None, :]    # (T,tq,C,M,d)
            rd = jnp.sum(diff * diff, axis=-1)
        else:
            flat = pts.reshape(T, C * max_leaf, dim)
            rd = jax.vmap(lambda qq, xx: metric.rdist(qq, xx))(
                qs_t, flat).reshape(T, tq, C, max_leaf)
        rd = jnp.where(valid[:, None], nan_to_inf(rd),
                       jnp.inf).reshape(T, tq, C * max_leaf)
        pids = jnp.broadcast_to(
            jnp.where(valid, pos, -1)[:, None],
            (T, tq, C, max_leaf)).reshape(T, tq, C * max_leaf)
        best_rd, best_ii = _merge_small_k(rd, pids, best_rd, best_ii, k)
        return best_rd, best_ii, ci + 1

    init = (jnp.full((T, tq, k), jnp.inf, dtype=dtype),
            jnp.full((T, tq, k), -1, dtype=jnp.int32),
            jnp.int32(0))
    best_rd, best_pos, chunks_done = jax.lax.while_loop(cond, body, init)

    best_rd = best_rd.reshape(T * tq, k)[: q + qpad]
    best_pos = best_pos.reshape(T * tq, k)[: q + qpad]
    # un-permute to caller order (padded repeats drop out)
    inv = jnp.zeros((q,), dtype=jnp.int32).at[qorder[:q + qpad]].set(
        jnp.arange(q + qpad, dtype=jnp.int32), mode="drop")
    best_rd = best_rd[inv]
    best_pos = best_pos[inv]

    best_ii = jnp.where(best_pos >= 0, orig_ids[jnp.maximum(best_pos, 0)],
                        -1)
    dists = monotone_distances(metric.rdistance_to_distance(best_rd))
    if not with_stats:
        return dists, best_ii
    stats = {
        "n_leaves": jnp.int32(L),
        "loop_chunks": chunks_done,
        "chunk_leaves": jnp.int32(C),
        "n_tiles": jnp.int32(T),
    }
    return dists, best_ii, stats


def _direct_dist_chunked(queries, rows, metric: Metric, chunk: int):
    """(Q, m) distances via the DIRECT difference form, streamed over row
    chunks — exact to rounding at any dim.  Radius semantics (strict d < r
    vs inclusive ub <= r boundary rules) demand the reference's own
    arithmetic, not the matmul form whose cancellation error flips
    boundary membership (the error bound exceeds |d - r| near the
    boundary; measured 400k+ wrong cells on un-centered 128-d data)."""
    q = queries.shape[0]
    m, dim = rows.shape
    c = max(1, min(chunk, m))
    n_chunks = -(-m // c)
    m_pad = n_chunks * c
    rows_p = jnp.pad(rows, ((0, m_pad - m), (0, 0))) if m_pad != m else rows
    chunks = rows_p.reshape(n_chunks, c, dim)

    def body(_, pc):
        if isinstance(metric, Euclidean):
            diff = queries[:, None, :] - pc[None, :, :]
            rd = jnp.sum(diff * diff, axis=-1)
        else:
            rd = metric.rdist(queries, pc)
        return None, metric.rdistance_to_distance(rd)

    _, out = jax.lax.scan(body, None, chunks)
    return jnp.moveaxis(out, 0, 1).reshape(q, m_pad)[:, :m]


@partial(jax.jit, static_argnames=("shape", "metric", "point_chunk"))
def radius_query_mask(points_perm, orig_pos_of_id, centroids, radii,
                      queries, radius, *, shape: TreeShape, metric: Metric,
                      point_chunk: int = 65536):
    """Batched radius search returning a (Q, n) membership mask in
    **original point-id order**, with the reference's exact boundary rules
    (inclusive subtree take, strict leaf filter: ball_tree.rs:250-294).

    All distances use the direct difference form (the reference's own
    arithmetic): boundary comparisons are two-sided here, so neither a
    deflated nor an inflated matmul bound preserves the semantics.

    ``orig_pos_of_id[j]`` = permuted position of original point j
    (the inverse of the idx permutation).
    """
    n, dim = points_perm.shape
    q = queries.shape[0]
    dtype = points_perm.dtype
    r = jnp.asarray(radius, dtype=dtype)

    # bounds for ALL nodes, exact direct form, chunked over nodes
    d_node = _direct_dist_chunked(queries, centroids, metric, point_chunk)
    lb = jnp.maximum(d_node - radii[None, :], 0.0)           # (Q, N)
    ub = d_node + radii[None, :]

    # reachability: a traversal descends through nodes it neither pruned
    # (lb > r) nor took wholesale (ub <= r) (ball_tree.rs:264-286).
    # Written with negated comparisons so NaN bounds descend, exactly like
    # the reference's `NaN > r == false` / `NaN <= r == false`.
    descend = ~(lb > r) & ~(ub <= r)
    reached_lvl = [jnp.ones((q, 1), dtype=bool)]             # level 0: root
    for level in range(1, shape.height):
        lo, hi = (1 << level) - 1, (1 << (level + 1)) - 1
        parents = (np.arange(lo, hi) - 1) // 2               # static
        reach_p = reached_lvl[level - 1][:, parents - ((1 << (level - 1)) - 1)]
        reached_lvl.append(reach_p & descend[:, parents])
    reached = jnp.concatenate(reached_lvl, axis=1)           # (Q, N)

    take_all = reached & (ub <= r)                           # inclusive take
    leaf_lo = shape.n_leaves - 1
    scan_leaf = (reached[:, leaf_lo:] & ~(lb[:, leaf_lo:] > r)
                 & ~(ub[:, leaf_lo:] <= r))

    # per-position flags: did any ancestor get taken wholesale?
    take_pos = jnp.zeros((q, n), dtype=bool)
    for level in range(shape.height):
        node_of_pos = jnp.asarray(shape.node_of_pos[level])  # (n,) static
        take_pos = take_pos | take_all[:, node_of_pos]
    scan_pos = scan_leaf[:, jnp.asarray(shape.node_of_pos[shape.height - 1]) - leaf_lo]

    # distances for scanned positions, streamed over point chunks
    c = max(1, min(point_chunk, n))
    n_chunks = -(-n // c)
    n_pad = n_chunks * c
    pp = jnp.pad(points_perm, ((0, n_pad - n), (0, 0))) if n_pad != n else points_perm
    chunks = pp.reshape(n_chunks, c, dim)
    rr = metric.distance_to_rdistance(r)
    col = jnp.arange(c, dtype=jnp.int32)

    def body(_, chunk_in):
        pts, base = chunk_in
        if isinstance(metric, Euclidean):
            # direct form at any dim: the strict d < r boundary must use
            # the reference's exact arithmetic
            diff = queries[:, None, :] - pts[None, :, :]
            rdm = nan_to_inf(jnp.sum(diff * diff, axis=-1))
        else:
            rdm = nan_to_inf(metric.rdist(queries, pts))
        m = (rdm < rr) & ((base + col)[None, :] < n)         # strict (:277)
        return None, m

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * c
    _, masks = jax.lax.scan(body, None, (chunks, bases))
    within = jnp.moveaxis(masks, 0, 1).reshape(q, n_pad)[:, :n]

    member_perm = take_pos | (scan_pos & within)             # permuted order
    return member_perm[:, orig_pos_of_id]                    # original order


def _radius_leaf_flags(queries, centroids, radii, r, shape: TreeShape,
                       metric: Metric, chunk: int):
    """Per-leaf radius flags: (take_leaf, scan_leaf), each (Q, L).

    take_leaf: the leaf (or an ancestor) was taken wholesale (ub <= r,
    inclusive) — every member is in with no distance test;
    scan_leaf: the traversal reached the leaf and it needs the strict
    d < r filter.  Mutually exclusive.  Same reachability recurrence and
    exact direct-form bound arithmetic as radius_query_mask.
    """
    q = queries.shape[0]
    d_node = _direct_dist_chunked(queries, centroids, metric, chunk)
    lb = jnp.maximum(d_node - radii[None, :], 0.0)
    ub = d_node + radii[None, :]
    descend = ~(lb > r) & ~(ub <= r)
    reached_lvl = [jnp.ones((q, 1), dtype=bool)]
    for level in range(1, shape.height):
        lo, hi = (1 << level) - 1, (1 << (level + 1)) - 1
        parents = (np.arange(lo, hi) - 1) // 2
        reach_p = reached_lvl[level - 1][:, parents - ((1 << (level - 1)) - 1)]
        reached_lvl.append(reach_p & descend[:, parents])
    reached = jnp.concatenate(reached_lvl, axis=1)
    take_all = reached & (ub <= r)

    leaf_lo = shape.n_leaves - 1
    scan_leaf = (reached[:, leaf_lo:] & ~(lb[:, leaf_lo:] > r)
                 & ~(ub[:, leaf_lo:] <= r))
    # take flag per leaf: any ancestor (incl. itself) taken wholesale
    anc = np.arange(leaf_lo, shape.n_nodes)
    take_leaf = jnp.zeros((q, shape.n_leaves), dtype=bool)
    for _level in range(shape.height):
        take_leaf = take_leaf | take_all[:, jnp.asarray(anc)]
        anc = (anc - 1) // 2
    return take_leaf, scan_leaf


@partial(jax.jit, static_argnames=("shape", "metric", "cap", "chunk_leaves",
                                   "point_chunk"))
def radius_query_capped(points_perm, orig_ids, centroids, radii,
                        queries, radius, *, shape: TreeShape, metric: Metric,
                        cap: int, chunk_leaves: int = 1,
                        point_chunk: int = 65536):
    """Tree-pruned batched radius search with capped neighbor lists.

    Unlike ``radius_query_mask`` (a dense sweep over all points — right
    for large result sets), this gathers ONLY the leaves each query's
    traversal reaches — the DBSCAN regime where small ε touches a handful
    of leaves out of thousands.  Identical membership semantics.

    Returns (ids (Q, cap) int32 original point ids, -1 padded; counts
    (Q,) int32).  counts may exceed ``cap`` (overflow detection); ids
    beyond cap are dropped.  Order of ids is traversal order (the
    reference returns unsorted order too, ball_tree.rs:137-142).
    """
    n, dim = points_perm.shape
    q = queries.shape[0]
    dtype = points_perm.dtype
    r = jnp.asarray(radius, dtype=dtype)
    rr = metric.distance_to_rdistance(r)
    L = shape.n_leaves
    max_leaf = shape.max_leaf_points

    take_leaf, scan_leaf = _radius_leaf_flags(
        queries, centroids, radii, r, shape, metric, point_chunk)
    emit = take_leaf | scan_leaf                          # (Q, L)

    # emitted leaves first, at GROUP granularity: ordering individual
    # leaves costs a (Q, L) row sort — measured ~110 us per 1k lanes per
    # row, ~450 ms of the ~500 ms call at config4's L=1024 (the round-4
    # radius_decomp_probe: the loop steps are ~5 ms each; the argsort was
    # the wall).  Groups of C CONSECUTIVE leaves cut the sort width to
    # L/C; the extra non-emitted leaves a group drags in are masked per
    # leaf below (never accepted — identical membership semantics).
    # DEFAULT is C=1 (the per-leaf sort): the round-5 A/B
    # (benchmarks/radius_ab_probe.py, 100k x 2-d and the scattered
    # dim-8 workload) measured C=1 >= C=4 at every epsilon — at
    # DBSCAN-regime eps the grouped gather pays up to ~C x the emitted-
    # leaf gather work (11.1k vs 5.0k QPS at eps=0.01) and the argsort
    # saving never materializes end-to-end.  C>1 remains a caller knob.
    C = max(1, min(chunk_leaves, L))
    G = -(-L // C)
    padL = G * C - L
    emit_g = jnp.pad(emit, ((0, 0), (0, padL))).reshape(q, G, C).any(-1)
    order = jnp.argsort(~emit_g, axis=1, stable=True).astype(jnp.int32)
    emit_sorted = jnp.take_along_axis(emit_g, order, axis=1)   # (Q, G)

    # _leaf_tables already carries the sentinel row at index L (start 0,
    # count 0 — the clamp target for pad leaves)
    starts_np, counts_np = _leaf_tables(shape)
    leaf_start = jnp.asarray(starts_np)
    leaf_count = jnp.asarray(counts_np)
    # pad the flag tables with the sentinel leaf column (never emitted)
    take_pad = jnp.pad(take_leaf, ((0, 0), (0, 1)))
    scan_pad = jnp.pad(scan_leaf, ((0, 0), (0, 1)))
    m_ar = jnp.arange(max_leaf, dtype=jnp.int32)
    c_ar = jnp.arange(C, dtype=jnp.int32)
    rows = jnp.arange(q)

    def cond(state):
        _, _, ci = state
        nxt = jax.lax.dynamic_slice(emit_sorted, (jnp.int32(0), ci),
                                    (q, 1))[:, 0]
        return (ci < G) & jnp.any(nxt)

    def body(state):
        out, cnt, ci = state
        gid = jax.lax.dynamic_slice(order, (jnp.int32(0), ci),
                                    (q, 1))                        # (Q, 1)
        leaf_ids = jnp.minimum(gid * C + c_ar[None, :], L)         # (Q, C)
        taken = jnp.take_along_axis(take_pad, leaf_ids, axis=1)
        scanned = jnp.take_along_axis(scan_pad, leaf_ids, axis=1)
        s = leaf_start[leaf_ids]
        lc = leaf_count[leaf_ids]
        pos = s[..., None] + m_ar[None, None, :]                   # (Q,C,M)
        valid = ((m_ar[None, None, :] < lc[..., None])
                 & (taken | scanned)[..., None])
        pos = jnp.where(valid, pos, 0)

        pts = points_perm[pos]
        if isinstance(metric, Euclidean):
            diff = pts - queries[:, None, None, :]
            rd = jnp.sum(diff * diff, axis=-1)
        else:
            flat = pts.reshape(q, C * max_leaf, dim)
            rd = jax.vmap(lambda qq, xx: metric.rdist(qq[None], xx)[0])(
                queries, flat).reshape(q, C, max_leaf)
        rd = nan_to_inf(rd)
        accept = valid & (taken[..., None] | (rd < rr))            # semantics
        accept = accept.reshape(q, C * max_leaf)
        ids = orig_ids[pos].reshape(q, C * max_leaf)

        # append accepted ids at per-query running offsets; beyond-cap
        # entries are dropped (counts still accumulate for detection)
        cols = cnt[:, None] + jnp.cumsum(accept, axis=1) - 1
        cols = jnp.where(accept, cols, cap)       # out-of-range -> dropped
        out = out.at[rows[:, None], cols].set(ids, mode="drop")
        cnt = cnt + jnp.sum(accept, axis=1).astype(jnp.int32)
        return out, cnt, ci + 1

    init = (jnp.full((q, cap), -1, dtype=jnp.int32),
            jnp.zeros((q,), dtype=jnp.int32),
            jnp.int32(0))
    out, cnt, _ = jax.lax.while_loop(cond, body, init)
    return out, cnt


@partial(jax.jit, static_argnames=("shape", "metric", "cap", "chunk_leaves",
                                   "tile_q", "point_chunk"))
def radius_query_capped_tiled(points_perm, orig_ids, centroids, radii,
                              queries, radius, *, shape: TreeShape,
                              metric: Metric, cap: int,
                              chunk_leaves: int = 8, tile_q: int = 128,
                              point_chunk: int = 65536):
    """``radius_query_capped`` with a TILE-SHARED leaf frontier (round-4
    port of the config1 trick to the radius path, the DBSCAN driver).

    The per-query scheme gathers each query's own emitted leaves: a
    (Q, C, M, d) HBM gather per loop step, repeated for the lockstep
    maximum of steps.  Here queries are SORTED BY LOCALITY (their first
    emitted leaf id — leaf ids are spatial, the tree orders them), and
    each tile of ``tile_q`` neighbors visits the UNION of its members'
    emitted leaves in one shared order: the gather shrinks by the tile
    factor and every slab is reused by all tile_q queries from VMEM.

    Membership is EXACTLY the per-query scheme's: each member accepts a
    point only when its OWN leaf flags say so (inclusive whole-subtree
    take / strict ``d < r`` leaf scan, ball_tree.rs:271-277) — visiting
    a leaf a member did not emit adds work, never results.  Counts stay
    exact past ``cap``; within-row order is traversal order (unsorted,
    like the reference).

    ``chunk_leaves`` default 8 from the round-5 A/B (radius_ab_probe,
    100k x 2-d: C8/tq128 9.6/8.7/6.6k QPS across eps vs 9.5/5.5/6.5k at
    the old C4; dim-8 scattered emission is C-insensitive, 1.7-1.8k at
    every C — the tile-union already absorbs the grouping waste).
    """
    n, dim = points_perm.shape
    q = queries.shape[0]
    r = jnp.asarray(radius, dtype=points_perm.dtype)
    rr = metric.distance_to_rdistance(r)
    L = shape.n_leaves
    max_leaf = shape.max_leaf_points

    take_leaf, scan_leaf = _radius_leaf_flags(
        queries, centroids, radii, r, shape, metric, point_chunk)
    emit = take_leaf | scan_leaf                          # (Q, L)

    # --- locality sort + tiling ------------------------------------------
    tq = max(1, min(tile_q, q))
    T = -(-q // tq)
    qpad = T * tq - q
    first_leaf = jnp.argmax(emit, axis=1).astype(jnp.int32)
    qorder = jnp.argsort(first_leaf, stable=True).astype(jnp.int32)
    if qpad:
        # pad with repeats of the last query: identical extra work whose
        # results land on the same inv slot (harmless, see unpermute)
        qorder = jnp.concatenate(
            [qorder, jnp.broadcast_to(qorder[-1:], (qpad,))])
    qs_t = queries[qorder].reshape(T, tq, dim)
    # per-member flag tables in tile order, + sentinel leaf column L
    take_s = jnp.pad(take_leaf, ((0, 0), (0, 1)))[qorder].reshape(
        T, tq, L + 1)
    scan_s = jnp.pad(scan_leaf, ((0, 0), (0, 1)))[qorder].reshape(
        T, tq, L + 1)
    emit_tile = jnp.any((take_s | scan_s)[:, :, :L], axis=1)  # (T, L)

    order_t = jnp.argsort(~emit_tile, axis=1, stable=True).astype(jnp.int32)
    emit_sorted = jnp.take_along_axis(emit_tile, order_t, axis=1)
    C = max(1, min(chunk_leaves, L))
    n_chunks = -(-L // C)
    pad = n_chunks * C - L
    if pad:
        order_t = jnp.pad(order_t, ((0, 0), (0, pad)), constant_values=L)
        emit_sorted = jnp.pad(emit_sorted, ((0, 0), (0, pad)),
                              constant_values=False)

    starts_np, counts_np = _leaf_tables(shape)
    leaf_start = jnp.asarray(starts_np)
    leaf_count = jnp.asarray(counts_np)
    m_ar = jnp.arange(max_leaf, dtype=jnp.int32)
    ti = jnp.arange(T, dtype=jnp.int32)[:, None, None]
    qi = jnp.arange(tq, dtype=jnp.int32)[None, :, None]

    def cond(state):
        _, _, ci = state
        nxt = jax.lax.dynamic_slice(emit_sorted, (jnp.int32(0), ci * C),
                                    (T, 1))[:, 0]
        return (ci < n_chunks) & jnp.any(nxt)

    def body(state):
        out, cnt, ci = state
        leaf_ids = jax.lax.dynamic_slice(order_t, (jnp.int32(0), ci * C),
                                         (T, C))                  # (T, C)
        s = leaf_start[leaf_ids]
        lc = leaf_count[leaf_ids]
        pos = s[..., None] + m_ar[None, None, :]                  # (T,C,M)
        valid = m_ar[None, None, :] < lc[..., None]
        pos = jnp.where(valid, pos, 0)
        pts = points_perm[pos]                                    # (T,C,M,d)
        if isinstance(metric, Euclidean):
            diff = pts[:, None] - qs_t[:, :, None, None, :]  # (T,tq,C,M,d)
            rd = jnp.sum(diff * diff, axis=-1)
        else:
            flat = pts.reshape(T, C * max_leaf, dim)
            rd = jax.vmap(lambda qq, xx: metric.rdist(qq, xx))(
                qs_t, flat).reshape(T, tq, C, max_leaf)
        rd = nan_to_inf(rd)
        lids = leaf_ids[:, None, :]                               # (T,1,C)
        mtake = jnp.take_along_axis(take_s, lids, axis=2)         # (T,tq,C)
        mscan = jnp.take_along_axis(scan_s, lids, axis=2)
        accept = valid[:, None] & (mtake[..., None]
                                   | (mscan[..., None] & (rd < rr)))
        accept = accept.reshape(T, tq, C * max_leaf)
        ids = jnp.broadcast_to(orig_ids[pos][:, None],
                               (T, tq, C, max_leaf)
                               ).reshape(T, tq, C * max_leaf)
        cols = cnt[..., None] + jnp.cumsum(accept, axis=-1) - 1
        cols = jnp.where(accept, cols, cap)      # out-of-range -> dropped
        out = out.at[ti, qi, cols].set(ids, mode="drop")
        cnt = cnt + jnp.sum(accept, axis=-1).astype(jnp.int32)
        return out, cnt, ci + 1

    init = (jnp.full((T, tq, cap), -1, dtype=jnp.int32),
            jnp.zeros((T, tq), dtype=jnp.int32),
            jnp.int32(0))
    out, cnt, _ = jax.lax.while_loop(cond, body, init)

    # un-permute to caller order (padded repeats collapse onto one slot)
    out = out.reshape(T * tq, cap)
    cnt = cnt.reshape(T * tq)
    inv = jnp.zeros((q,), dtype=jnp.int32).at[qorder].set(
        jnp.arange(T * tq, dtype=jnp.int32), mode="drop")
    return out[inv], cnt[inv]
