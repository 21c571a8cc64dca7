"""Top-k primitives with the reference's NaN/total-order policy.

The reference gets a total order from ``OrderedFloat`` (NaN sorts greater
than every number, CHANGELOG.md:111-115), so a NaN-coordinate point is
"farther than everything" instead of poisoning comparisons.  Here the same
policy is a single ``where(isnan, +inf)`` applied before ``lax.top_k``.

All functions operate on the **last axis** and return results sorted
ascending by distance (the reference's ``query`` contract,
ball_tree.rs:117-120).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["nan_to_inf", "smallest_k", "merge_topk", "monotone_distances"]


def nan_to_inf(d):
    """Map NaN distances to +inf (OrderedFloat NaN-is-greatest policy)."""
    return jnp.where(jnp.isnan(d), jnp.inf, d)


def monotone_distances(d):
    """Running max along the last axis: restore the ascending contract
    after an rd -> distance conversion.

    Results are SORTED in the rdistance domain; TPU's f32 sqrt (and the
    Minkowski p-th root) is an approximation with 1-2 ulp error and is
    NOT monotone at the ulp level, so two rds 1-2 ulps apart can convert
    to *inverted* distances (observed on v5e: sorted rd pair
    (1152900.75, 1152901.0) -> sqrt (1073.73230, 1073.73218)).  The
    running max clamps such inversions within the conversion's own error
    band.  NaN rows (NaN queries) propagate unchanged; +inf tails are
    fixed points."""
    d = jnp.asarray(d)
    return jax.lax.cummax(d, axis=d.ndim - 1)


def smallest_k(dists, indices, k: int):
    """Smallest-``k`` (values ascending) along the last axis.

    ``indices`` carries the payload (original point ids) selected alongside.
    Ties are broken toward the earlier position, which is deterministic
    (the reference's heap tie order is arbitrary; only distances are part
    of its contract, ball_tree.rs:396-421).
    """
    d = nan_to_inf(dists)
    if d.shape[-1] < k:  # fewer candidates than k: pad with +inf / -1
        pad = [(0, 0)] * (d.ndim - 1) + [(0, k - d.shape[-1])]
        d = jnp.pad(d, pad, constant_values=jnp.inf)
        indices = jnp.pad(indices, pad, constant_values=-1)
    neg_vals, pos = jax.lax.top_k(-d, k)
    sel = jnp.take_along_axis(indices, pos, axis=-1)
    return -neg_vals, sel


def merge_topk(d1, i1, d2, i2, k: int):
    """Merge two ascending top-k lists into one ascending top-k list."""
    d = jnp.concatenate([d1, d2], axis=-1)
    i = jnp.concatenate([i1, i2], axis=-1)
    return smallest_k(d, i, k)


def rescore_exact(points, queries, idx, k: int):
    """Re-score candidate ids with the direct (q-x)^2 form and re-rank.

    The matmul distance form loses absolute accuracy ~eps*(|q|^2+|x|^2) to
    cancellation; every matmul-candidate path funnels its top-(k+slack)
    through this single helper to restore exact-to-rounding distances.
    ``idx`` entries < 0 (or >= len(points)) are treated as missing.

    Returns (rdist, idx) ascending, shapes (..., k).
    """
    n = points.shape[0]
    ok = (idx >= 0) & (idx < n)
    safe = jnp.where(ok, idx, 0)
    cand = points[safe]                                # (..., k_in, d)
    diff = queries[..., None, :] - cand
    rd = jnp.sum(diff * diff, axis=-1)
    rd = jnp.where(ok, nan_to_inf(rd), jnp.inf)
    return smallest_k(rd, jnp.where(ok, idx, -1), k)
