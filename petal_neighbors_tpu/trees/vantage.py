"""VantagePointTree (parity: src/vantage_point_tree.rs).

Build replicates the reference exactly (vantage_point_tree.rs:146-197):
the vantage point is the **last element of the slice** (deterministic,
:169-170), the rest are sorted by distance to it (:178), the radius is the
median distance (``far[0]``, :180-182), and singleton leaves carry radius
``A::max_value()`` (:158-167).  Because the split is positional (at half),
the tree is always balanced — depth <= ceil(log2 n) + 1 — which bounds the
lockstep query stack statically.

Query is a **batched DFS stack machine** (JAX ``while_loop``): every query
pops one node per step in lockstep; the reference's deferred pruning
("search near, then far only if d + best > radius", :111-129) is encoded
as a *prune key* pushed with each deferred child and re-checked against
the current best at pop time — later information, exactly like the
recursive original, so the visit set matches.

The reference VP tree only has ``query_nearest`` (:88-98).  ``query`` (k-NN)
and ``query_radius`` are extensions (SURVEY.md §2.4 / BASELINE config #2),
built on the same stack machine / brute-force ops.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..distance import Euclidean, Metric, get_metric
from ..ops import bruteforce as bf
from ..ops.topk import nan_to_inf, smallest_k
from ..utils.validation import check_points, check_query, check_query_batch
from .ball_build import _np_rowwise_dist

__all__ = ["VantagePointTree"]

NULL = -1  # reference uses usize::MAX (vantage_point_tree.rs:207)


@dataclass(frozen=True, eq=False)
class _VPStatic:
    """Static metadata (hashable identity for jit)."""
    n_nodes: int
    depth: int


def _build_host(points: np.ndarray, metric: Metric):
    """Reference-semantics host build (vantage_point_tree.rs:132-197).

    Iterative DFS over (slice of (distance, id) pairs); node ids are
    assigned in the reference's pre-order push order.
    """
    n = points.shape[0]
    dtype = points.dtype
    fmax = np.finfo(dtype).max

    vp = np.zeros(n, dtype=np.int64)
    radius = np.zeros(n, dtype=dtype)
    near = np.full(n, NULL, dtype=np.int64)
    far = np.full(n, NULL, dtype=np.int64)
    n_nodes = 0

    ids0 = np.arange(n, dtype=np.int64)

    # stack entries: (ids, parent_node, which_child, depth) — the parent
    # link is patched after the child id is known (:192-195)
    root = -1
    depth_max = 0
    stack = [(ids0, -1, "root", 0)]
    while stack:
        ids, parent, slot, depth = stack.pop()
        depth_max = max(depth_max, depth)
        if len(ids) == 0:
            node = NULL
        else:
            node = n_nodes
            n_nodes += 1
            if len(ids) == 1:
                vp[node] = ids[0]
                radius[node] = fmax          # leaf radius = MAX (:158-167)
            else:
                v = ids[-1]                  # vantage = last (:169-170)
                rest = ids[:-1]
                d = _np_rowwise_dist(
                    metric, points[rest],
                    np.broadcast_to(points[v], (len(rest), points.shape[1])))
                order = np.argsort(d, kind="stable")  # NaN sorts last
                rest = rest[order]
                d = d[order]
                half = len(rest) // 2
                vp[node] = v
                radius[node] = d[half]       # median = far[0] (:180-182)
                # push far first so near is built (and numbered) first,
                # matching the reference's recursion order (:192-193)
                stack.append((rest[half:], node, "far", depth + 1))
                stack.append((rest[:half], node, "near", depth + 1))
        if slot == "root":
            root = node
        elif slot == "near":
            near[parent] = node
        else:
            far[parent] = node

    return (vp[:n_nodes], radius[:n_nodes], near[:n_nodes], far[:n_nodes],
            root, depth_max)


@partial(jax.jit, static_argnames=("k", "static", "metric", "with_stats"))
def _vp_knn(points, vp, radius, near, far, root, queries, *,
            k: int, static: _VPStatic, metric: Metric,
            with_stats: bool = False):
    """Lockstep batched DFS with deferred prune keys.

    Exact for any k <= n: a node is skipped only when the reference's own
    strict pruning condition (checked against the *current* best, i.e. at
    pop time) holds (vantage_point_tree.rs:111-129).
    """
    q, dim = queries.shape[0], queries.shape[1]
    dtype = points.dtype
    cap = static.depth + 4
    neg_inf = jnp.array(-jnp.inf, dtype=dtype)

    stack = jnp.zeros((q, cap), dtype=jnp.int32)
    keys = jnp.full((q, cap), neg_inf, dtype=dtype)
    stack = stack.at[:, 0].set(jnp.int32(root))
    sp = jnp.ones((q,), dtype=jnp.int32)

    # UNSORTED top-k working set: per-step maintenance is a handful of
    # (Q, k) elementwise ops instead of a TopK custom call — the loop body
    # runs tens of thousands of lockstep iterations, so per-step cost is
    # everything.  Sorted once at the end.  (Warm-starting tau with seed
    # candidates was tried and measured: visit counts unchanged — VP
    # pruning here is structure-dominated, not tau-dominated.)
    best_d = jnp.full((q, k), jnp.inf, dtype=dtype)
    best_i = jnp.full((q, k), -1, dtype=jnp.int32)
    rows = jnp.arange(q)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (q, k), 1)

    def tau(bd):
        return jnp.max(bd, axis=1)  # kth best (inf until filled)

    visits0 = jnp.zeros((q,), dtype=jnp.int32)

    def cond(state):
        sp = state[4]
        return jnp.any(sp > 0)

    def body(state):
        best_d, best_i, stack, keys, sp, visits = state
        active = sp > 0
        top = jnp.where(active, sp - 1, 0)
        node = stack[rows, top]
        key = keys[rows, top]
        sp = jnp.where(active, sp - 1, sp)

        # deferred prune check: visit only if tau > key (strict, like the
        # reference's `d + best > r` / `d - best < r` conditions)
        visit = active & (tau(best_d) > key)

        v = vp[node]
        r = radius[node]
        d = nan_to_inf(metric.rowwise_dist(queries, points[v]))  # (Q,)

        # best update (reference :106-109, generalized to top-k): replace
        # the working set's per-query max when strictly better
        cur_max = jnp.max(best_d, axis=1)
        amax = jnp.argmax(best_d, axis=1).astype(jnp.int32)
        take = visit & (d < cur_max)
        sel = (kcol == amax[:, None]) & take[:, None]
        best_d = jnp.where(sel, d[:, None], best_d)
        best_i = jnp.where(sel, v[:, None].astype(jnp.int32), best_i)

        nr = near[node]
        fr = far[node]
        near_branch = d < r                       # :111 vs :120
        # deferred child (searched second, with prune key):
        #   near branch: far, visit iff best > r - d   (:116)
        #   far branch:  near, visit iff best > d - r  (:125)
        c1 = jnp.where(near_branch, fr, nr)
        k1 = jnp.where(near_branch, r - d, d - r).astype(dtype)
        # immediate child (searched first, unconditional):
        c2 = jnp.where(near_branch, nr, fr)

        def push(stack, keys, sp, child, ckey, do):
            do = do & (child != NULL)
            slot = jnp.where(do, sp, 0)
            cur_s = stack[rows, slot]
            cur_k = keys[rows, slot]
            stack = stack.at[rows, slot].set(
                jnp.where(do, child.astype(jnp.int32), cur_s))
            keys = keys.at[rows, slot].set(jnp.where(do, ckey, cur_k))
            sp = jnp.where(do, sp + 1, sp)
            return stack, keys, sp

        stack, keys, sp = push(stack, keys, sp, c1, k1, visit)
        stack, keys, sp = push(stack, keys, sp, c2,
                               jnp.full_like(k1, neg_inf), visit)
        visits = visits + visit.astype(jnp.int32)
        return best_d, best_i, stack, keys, sp, visits

    best_d, best_i, _, _, _, visits = jax.lax.while_loop(
        cond, body, (best_d, best_i, stack, keys, sp, visits0))
    # sort ascending once, at the end
    out = smallest_k(best_d, best_i, k)
    if with_stats:
        # observability (SURVEY.md §5): per-query node-visit counts
        stats = {"nodes_visited": visits,
                 "n_nodes": jnp.int32(static.n_nodes),
                 "visit_ratio": visits / static.n_nodes}
        return out[0], out[1], stats
    return out


@partial(jax.jit, static_argnames=("static", "metric", "cap"))
def _vp_radius(points, vp, radius, near, far, root, queries, r, *,
               static: _VPStatic, metric: Metric, cap: int):
    """Tree-pruned batched radius search (extension; inclusive d <= r).

    Same lockstep DFS as ``_vp_knn`` with a FIXED threshold: by the
    triangle inequality, points in the near child lie within ``rho`` of
    the vantage point, so the near subtree can be skipped when
    d(q, vp) - r > rho; the far subtree when d(q, vp) + r < rho.
    Inclusive comparisons keep boundary members.

    Returns (ids (Q, cap) int32, -1 padded; counts (Q,) exact even past
    cap — overflow detectable).
    """
    q = queries.shape[0]
    dtype = points.dtype
    cap_stack = static.depth + 4

    stack = jnp.zeros((q, cap_stack), dtype=jnp.int32)
    stack = stack.at[:, 0].set(jnp.int32(root))
    sp = jnp.ones((q,), dtype=jnp.int32)
    rows = jnp.arange(q)
    rr = jnp.asarray(r, dtype=dtype)

    out0 = jnp.full((q, cap), -1, dtype=jnp.int32)
    cnt0 = jnp.zeros((q,), dtype=jnp.int32)

    def cond(state):
        return jnp.any(state[2] > 0)

    def body(state):
        out, cnt, sp, stack = state
        active = sp > 0
        top = jnp.where(active, sp - 1, 0)
        node = stack[rows, top]
        sp = jnp.where(active, sp - 1, sp)

        v = vp[node]
        rho = radius[node]
        draw = metric.rowwise_dist(queries, points[v])           # (Q,)
        dnan = jnp.isnan(draw)
        d = nan_to_inf(draw)

        accept = active & (d <= rr)
        # non-accepting rows and beyond-cap appends land at col >= cap and
        # are dropped by the scatter; counts stay exact
        col = jnp.where(accept, cnt, cap)
        out = out.at[rows, col].set(v.astype(jnp.int32), mode="drop")
        cnt = cnt + accept.astype(jnp.int32)

        nr = near[node]
        fr = far[node]
        # a NaN vantage distance gives no valid bound: visit both subtrees
        push_near = active & (nr != NULL) & ((d - rr <= rho) | dnan)
        push_far = active & (fr != NULL) & ((d + rr >= rho) | dnan)

        def push(stack, sp, child, do):
            slot = jnp.where(do, sp, 0)
            cur = stack[rows, slot]
            stack = stack.at[rows, slot].set(
                jnp.where(do, child.astype(jnp.int32), cur))
            return stack, jnp.where(do, sp + 1, sp)

        stack, sp = push(stack, sp, fr, push_far)
        stack, sp = push(stack, sp, nr, push_near)
        return out, cnt, sp, stack

    out, cnt, _, _ = jax.lax.while_loop(cond, body,
                                        (out0, cnt0, sp, stack))
    return out, cnt


class VantagePointTree:
    """Exact VP-tree index (vantage_point_tree.rs:13-198)."""

    def __init__(self, points, metric: Metric | str = "euclidean", *,
                 builder: str = "auto"):
        """Build the tree (reference ``new``, vantage_point_tree.rs:51-72).
        Raises ``EmptyArrayError`` / ``NotContiguousError`` like the
        reference.

        ``builder``: "auto" (on-device level-synchronous build for large
        corpora on an accelerator, else the native/host build), "device",
        or "host" (native C++ when available, NumPy otherwise — exact
        reference node numbering).
        """
        self.metric = get_metric(metric)
        if not self.metric.tree_compatible:
            raise ValueError(
                f"metric {self.metric.name!r} violates the triangle "
                "inequality, so VP-tree pruning bounds are invalid; "
                "use BruteForce for this metric")
        self.points = check_points(points)
        self.metric.validate_dim(self.points.shape[1])
        host_pts = np.asarray(self.points)
        if builder == "auto":
            from ._auto import use_device_build
            builder = "device" if use_device_build(host_pts.shape[0]) \
                else "host" 
        if builder == "device":
            from . import vantage_build_device
            built = vantage_build_device.build_device(self.points,
                                                      self.metric)
        elif builder == "host":
            # native (C++) builder when available: same semantics, no
            # per-node Python overhead (O(n) recursion steps)
            built = None
            try:
                from .. import native
                built = native.vp_build(host_pts, self.metric)
            except Exception:
                built = None
            if built is None:
                built = _build_host(host_pts, self.metric)
        else:
            raise ValueError(f"unknown builder {builder!r}")
        vp, radius, near, far, root, depth = built
        self._init_arrays(vp, radius, near, far, root, depth)

    def _init_arrays(self, vp, radius, near, far, root, depth) -> None:
        self.root = int(root)
        self._static = _VPStatic(n_nodes=len(vp), depth=int(depth))
        self._vp = jnp.asarray(vp, dtype=jnp.int32)
        self._radius = jnp.asarray(radius)
        self._near = jnp.asarray(near, dtype=jnp.int32)
        self._far = jnp.asarray(far, dtype=jnp.int32)
        # host copies for accessors
        self.nodes = {"vantage_point": vp, "radius": radius,
                      "near": near, "far": far}

    @classmethod
    def euclidean(cls, points) -> "VantagePointTree":
        """Convenience constructor (vantage_point_tree.rs:31-37)."""
        return cls(points, Euclidean())

    @classmethod
    def _from_arrays(cls, points, metric, vp, radius, near, far, root,
                     depth):
        """Rehydrate from serialized arrays (utils.serialize) — no rebuild."""
        self = cls.__new__(cls)
        self.metric = get_metric(metric)
        self.points = check_points(points)
        self._init_arrays(np.asarray(vp), np.asarray(radius),
                          np.asarray(near), np.asarray(far), root, depth)
        return self

    def save(self, path) -> None:
        """Checkpoint the index to an ``.npz`` (see utils.serialize)."""
        from ..utils.serialize import save_index
        save_index(self, path)

    @property
    def n(self) -> int:
        return self.points.shape[0]

    @property
    def dim(self) -> int:
        return self.points.shape[1]

    def num_points(self) -> int:
        return self.n

    # -- reference API ------------------------------------------------------
    def query_nearest(self, needle):
        """(index, distance) of the nearest point
        (vantage_point_tree.rs:88-98)."""
        qv = check_query(needle, self.dim, self.points.dtype)
        d, i = self._knn(qv[None, :], 1)
        return int(i[0, 0]), float(d[0, 0])

    # -- extensions (SURVEY.md §2.4) ---------------------------------------
    def query(self, needle, k: int):
        """k nearest (ascending), same contract as BallTree.query."""
        qv = check_query(needle, self.dim, self.points.dtype)
        k_eff = min(int(k), self.n)
        if k_eff == 0:
            return (np.zeros(0, dtype=np.int64),
                    np.zeros(0, dtype=np.asarray(self.points).dtype))
        d, i = self._knn(qv[None, :], k_eff)
        return np.asarray(i[0]).astype(np.int64), np.asarray(d[0])

    def query_batch(self, queries, k: int, *, with_stats: bool = False):
        """Batched k-NN. ``with_stats=True`` also returns per-query
        node-visit counts (observability, SURVEY.md §5)."""
        qs = check_query_batch(queries, self.dim, self.points.dtype)
        k_eff = min(int(k), self.n)
        if k_eff == 0:
            empty = (jnp.zeros((qs.shape[0], 0), dtype=self.points.dtype),
                     jnp.zeros((qs.shape[0], 0), dtype=jnp.int32))
            return (*empty, {}) if with_stats else empty
        return self._knn(qs, k_eff, with_stats=with_stats)

    def query_nearest_batch(self, queries):
        d, i = self.query_batch(queries, 1)
        return i[:, 0], d[:, 0]

    def query_radius(self, needle, distance):
        """All indices with d <= distance (extension; inclusive boundary —
        the VP tree has no reference radius semantics to replicate).
        Tree-pruned via the triangle inequality on vantage radii."""
        qv = check_query(needle, self.dim, self.points.dtype)
        ids, cnt = self._radius_capped(qv[None, :], distance, self.n)
        return np.sort(np.asarray(ids[0])[: int(cnt[0])]).astype(np.int64)

    def query_radius_batch(self, queries, distance, *, cap: int | None = None):
        """Batched radius search: (Q, n) mask (dense scan) or, with
        ``cap``, tree-pruned ``(indices (Q, cap), counts)``."""
        qs = check_query_batch(queries, self.dim, self.points.dtype)
        if cap is None:
            return bf.radius_mask(self.points, qs, distance, self.metric)
        return self._radius_capped(qs, distance, cap)

    def _radius_capped(self, qs, distance, cap: int):
        return _vp_radius(self.points, self._vp, self._radius, self._near,
                          self._far, self.root, qs,
                          jnp.asarray(distance, dtype=self.points.dtype),
                          static=self._static, metric=self.metric, cap=cap)

    def _knn(self, qs, k_eff: int, with_stats: bool = False):
        return _vp_knn(self.points, self._vp, self._radius, self._near,
                       self._far, self.root, qs,
                       k=k_eff, static=self._static, metric=self.metric,
                       with_stats=with_stats)
