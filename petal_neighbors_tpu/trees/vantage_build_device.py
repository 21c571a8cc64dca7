"""Device-side (XLA) level-synchronous vantage-point-tree builder.

Key observation: although the reference builds the VP tree recursively
with pointer-style nodes (vantage_point_tree.rs:146-197), its *shape* is
as static as the ball tree's — the vantage point is the positionally LAST
element of each slice and the near/far split is at ``len(rest)//2`` — so
every level's segment ranges are a pure function of ``n``.  The recursion
therefore collapses into O(depth) device steps:

  per level:  gather each segment's vantage point (a static position),
              compute member→vantage distances (one fused rowwise pass),
              ONE stable two-key sort (block id, distance) that orders
              every segment's rest simultaneously, and static gathers for
              the median radii.

Positions outside the current level (vantage points finalized at earlier
levels) are pinned by making each its own sort block; within a segment
the vantage row is pinned behind the rest via a NaN key (the XLA total
order places NaN last; stability keeps the vantage, originally last,
behind NaN-distance members — matching OrderedFloat semantics).

Node numbering is ours (level-order); queries only consume the
vp/radius/near/far arrays, which encode the same structure the reference
builds: vantage = slice-last, radius = median distance, near = closer
half (same sets; tie order may differ like the other sort-based builders).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..distance import Metric

__all__ = ["vp_shape", "build_device"]

NULL = -1


@dataclass(frozen=True, eq=False)  # identity hash: interned via lru_cache
class VpShape:
    """Static VP-tree geometry for n points (node ids in level order).

    Per level: ``(node_ids, vp_positions, rad_positions, block_of_pos,
    vp_pos_of_pos)`` — everything the device build needs as constants.
    """

    n: int
    depth: int
    n_nodes: int
    levels: tuple = field(repr=False, default=())
    near: np.ndarray = None
    far: np.ndarray = None
    is_leaf: np.ndarray = None


@lru_cache(maxsize=8)  # entries are O(#segments) — the per-position
# arrays are derived at trace time in _build, not cached here
def vp_shape(n: int) -> VpShape:
    """Mirrors create_node's slicing (vantage_point_tree.rs:169-195):
    segment [s, e) has vantage at e-1; rest [s, e-1) splits at
    half = (e-1-s)//2 into near [s, s+half) and far [s+half, e-1)."""
    near_l, far_l, leaf = [], [], []
    levels = []
    frontier = [(0, n, 0)]        # (start, end, node_id), position-ordered
    next_id = 1
    depth = 0
    while frontier:
        starts = np.array([s for s, _, _ in frontier])
        ends = np.array([e for _, e, _ in frontier])
        node_ids = np.array([i for _, _, i in frontier])

        vp_positions = (ends - 1).astype(np.int32)
        # median position of the sorted rest; singletons point at e-1
        # (unused — radius stays MAX)
        halves = np.maximum(ends - 1 - starts, 0) // 2
        rad_positions = (starts + halves).astype(np.int32)

        levels.append((starts.astype(np.int64), ends.astype(np.int64),
                       node_ids, vp_positions, rad_positions))

        nxt = []
        for (s, e, node) in frontier:
            assert node == len(near_l)
            if e - s == 1:
                near_l.append(NULL)
                far_l.append(NULL)
                leaf.append(True)
                continue
            leaf.append(False)
            half = (e - 1 - s) // 2
            for cs, ce, out_list in ((s, s + half, near_l),
                                     (s + half, e - 1, far_l)):
                if ce - cs == 0:
                    out_list.append(NULL)
                else:
                    out_list.append(next_id)
                    nxt.append((cs, ce, next_id))
                    next_id += 1
        frontier = nxt
        if frontier:
            depth += 1

    return VpShape(
        n=n, depth=depth, n_nodes=next_id,
        levels=tuple(levels),
        near=np.array(near_l, dtype=np.int64),
        far=np.array(far_l, dtype=np.int64),
        is_leaf=np.array(leaf, dtype=bool),
    )


@partial(jax.jit, static_argnames=("shape", "metric"))
def _build(points, *, shape: VpShape, metric: Metric):
    n, d = points.shape
    dtype = points.dtype
    fmax = jnp.asarray(np.finfo(np.dtype(dtype).name).max, dtype=dtype)
    ids = jnp.arange(n, dtype=jnp.int32)
    vp = jnp.zeros(shape.n_nodes, dtype=jnp.int32)
    radius = jnp.full(shape.n_nodes, fmax, dtype=dtype)
    iota = jnp.arange(n, dtype=jnp.int32)

    for starts, ends, node_ids, vp_positions, rad_positions in shape.levels:
        # per-position maps, derived at trace time (kept out of the
        # vp_shape cache: they are O(n) per level)
        # block ids: each level segment is one block; positions outside
        # any segment are singleton blocks (pins them through the sort)
        bnd = np.zeros(n + 1, dtype=bool)
        bnd[0] = True
        in_seg = np.zeros(n, dtype=bool)
        for s_, e_ in zip(starts, ends):
            bnd[s_] = True
            bnd[e_] = True
            in_seg[s_:e_] = True
        out = np.flatnonzero(~in_seg)
        bnd[out] = True
        bnd[out + 1] = True
        block = jnp.asarray((np.cumsum(bnd[:n]) - 1).astype(np.int32))
        vpp_np = np.arange(n, dtype=np.int32)
        for s_, e_ in zip(starts, ends):
            vpp_np[s_:e_] = e_ - 1
        vpp = jnp.asarray(vpp_np)

        # distance of every in-level member to its segment's vantage
        vp_row = points[ids[vpp]]                            # (n, d)
        dist = metric.rowwise_dist(points[ids], vp_row)      # (n,)

        # record this level's vantage ids
        node_ids_j = jnp.asarray(node_ids)
        vp = vp.at[node_ids_j].set(ids[jnp.asarray(vp_positions)])

        # one stable two-key sort orders every segment's rest; vantage and
        # pinned rows (vpp == own position) keep their places via NaN key
        # + stability + singleton blocks
        key = jnp.where(vpp == iota, jnp.nan, dist).astype(dtype)
        _, key_sorted, perm = jax.lax.sort(
            (block, key, iota), num_keys=2, is_stable=True)
        ids = ids[perm]

        # radius = median of the sorted rest (vantage_point_tree.rs:180-182);
        # NaN medians (NaN data) stay NaN like the host builder's
        leaf_mask = jnp.asarray(shape.is_leaf[node_ids])
        med = key_sorted[jnp.asarray(rad_positions)]
        radius = radius.at[node_ids_j].set(
            jnp.where(leaf_mask, fmax, med))

    return vp, radius


def build_device(points, metric: Metric):
    """Returns (vp, radius, near, far, root, depth) matching the host
    builder's structure semantics (vantage=slice-last, median radius,
    near=closer half); node numbering is level-order."""
    shape = vp_shape(int(points.shape[0]))
    vp, radius = _build(jnp.asarray(points), shape=shape, metric=metric)
    return (np.asarray(vp).astype(np.int64), np.asarray(radius),
            shape.near.copy(), shape.far.copy(), 0, shape.depth)
