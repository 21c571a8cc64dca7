"""Device-side (XLA) level-synchronous ball-tree builder.

The recursive host build (ball_tree.rs:504-538) becomes O(height) fully
vectorized device steps — the host contributes only the static level loop
(SURVEY.md §3.1 "TPU redesign"):

  per level:  segment_sum / segment_max / segment_min over the permuted
              points (centroid, radius, per-column spread), an argmax for
              the split column, and ONE two-key ``lax.sort`` that
              median-partitions every segment of the level simultaneously.

Ranges/segment-ids are static (utils.tree_math), so the whole build jits
into a single XLA program: no host<->device ping-pong, no per-node
dispatch — the build lives at HBM bandwidth.

Same geometry semantics as the host builders (mean centroid, IEEE-maxNum
radius fold, first-wins max-spread, NaN-last partition order); centroid
accumulation is in the input dtype on-device (f32 on TPU) versus f64 on
the host — query exactness is unaffected because bounds are *valid* for
whatever centroid is stored.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..distance import Metric
from ..utils.tree_math import TreeShape
from .ball_build import BallTreeData

__all__ = ["build_device"]


@partial(jax.jit, static_argnames=("shape", "metric"))
def _build(points, *, shape: TreeShape, metric: Metric):
    n, d = points.shape
    dtype = points.dtype
    idx = jnp.arange(n, dtype=jnp.int32)
    centroids = jnp.zeros((shape.n_nodes, d), dtype=dtype)
    radii = jnp.zeros((shape.n_nodes,), dtype=dtype)
    pp = points                      # points in current permutation order
    iota = jnp.arange(n, dtype=jnp.int32)

    for level in range(shape.height):
        lo, hi = (1 << level) - 1, (1 << (level + 1)) - 1
        nseg = hi - lo
        seg = jnp.asarray(shape.node_of_pos[level].astype(np.int32)) - lo
        counts = jnp.asarray(
            (shape.range_end[lo:hi] - shape.range_start[lo:hi]).astype(
                np.dtype(dtype).name))

        # centroid = segment mean (ball_tree.rs:445-456)
        sums = jax.ops.segment_sum(pp, seg, num_segments=nseg,
                                   indices_are_sorted=True)
        cent = sums / counts[:, None]
        centroids = jax.lax.dynamic_update_slice(centroids, cent, (lo, 0))

        # radius = IEEE-maxNum fold of metric distances (:458-460)
        dist = metric.rowwise_dist(pp, cent[seg])
        dist = jnp.where(jnp.isnan(dist), 0.0, dist)
        rad = jax.ops.segment_max(dist, seg, num_segments=nseg,
                                  indices_are_sorted=True)
        radii = jax.lax.dynamic_update_slice(radii, rad, (lo,))

        if level == shape.height - 1:
            break

        # split column: max spread, first-wins; NaN never wins (:577-613)
        mins = jax.ops.segment_min(pp, seg, num_segments=nseg,
                                   indices_are_sorted=True)
        maxs = jax.ops.segment_max(pp, seg, num_segments=nseg,
                                   indices_are_sorted=True)
        spread = maxs - mins
        spread = jnp.where(jnp.isnan(spread), -jnp.inf, spread)
        cols = jnp.argmax(spread, axis=1).astype(jnp.int32)   # (nseg,)

        # one two-key sort median-partitions every segment: primary key =
        # segment id, secondary = value in that segment's split column
        # (NaN sorts last — OrderedFloat policy)
        key = jnp.take_along_axis(pp, cols[seg][:, None], axis=1)[:, 0]
        _, _, perm = jax.lax.sort((seg, key, iota), num_keys=2)
        idx = idx[perm]
        pp = pp[perm]

    return centroids, radii, idx


def build_device(points, shape: TreeShape, metric: Metric) -> BallTreeData:
    centroids, radii, idx = _build(jnp.asarray(points), shape=shape,
                                   metric=metric)
    return BallTreeData(centroids=centroids, radii=radii,
                        idx=np.asarray(idx).astype(np.int64), shape=shape)
