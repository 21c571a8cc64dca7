"""Round-4 probe: where does the capped radius path spend its time?

Staged variants, each its own jitted program over the SAME inputs, all
measured in one process (best-of-3 each, two interleaved sweeps):

  flags     _radius_leaf_flags only
  sortL     flags + per-LEAF argsort (width L, the r3 scheme)
  sortG     flags + per-GROUP argsort (width L/C, the r4 scheme)
  gather    sortG + loop{leaf gather + rd, fold into a running sum}
  counts    gather + accept + per-query counts
  full      the shipped radius_query_capped (group scheme)

Usage: python -u benchmarks/radius_decomp_probe.py [n] [q] [C]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from jax import lax
from petal_neighbors_tpu.trees import ball_query
from petal_neighbors_tpu.trees.ball_query import (_radius_leaf_flags,
                                                  _leaf_tables)


def say(msg):
    print(msg, flush=True)


@functools.partial(jax.jit, static_argnames=("shape", "metric", "mode",
                                             "cap", "C"))
def probe(points_perm, orig_ids, centroids, radii, queries, radius, *,
          shape, metric, mode: str, cap: int = 512, C: int = 4):
    n, dim = points_perm.shape
    q = queries.shape[0]
    dtype = points_perm.dtype
    r = jnp.asarray(radius, dtype=dtype)
    rr = metric.distance_to_rdistance(r)
    L = shape.n_leaves
    max_leaf = shape.max_leaf_points

    take_leaf, scan_leaf = _radius_leaf_flags(
        queries, centroids, radii, r, shape, metric, 65536)
    emit = take_leaf | scan_leaf
    if mode == "flags":
        return jnp.sum(emit)
    if mode == "sortL":
        order = jnp.argsort(~emit, axis=1, stable=True).astype(jnp.int32)
        return jnp.sum(order * emit)

    G = -(-L // C)
    padL = G * C - L
    emit_g = jnp.pad(emit, ((0, 0), (0, padL))).reshape(q, G, C).any(-1)
    order = jnp.argsort(~emit_g, axis=1, stable=True).astype(jnp.int32)
    emit_sorted = jnp.take_along_axis(emit_g, order, axis=1)
    if mode == "sortG":
        return jnp.sum(order * emit_g)

    starts_np, counts_np = _leaf_tables(shape)
    leaf_start = jnp.asarray(np.append(starts_np, 0))
    leaf_count = jnp.asarray(np.append(counts_np, 0))
    take_pad = jnp.pad(take_leaf, ((0, 0), (0, 1)))
    scan_pad = jnp.pad(scan_leaf, ((0, 0), (0, 1)))
    m_ar = jnp.arange(max_leaf, dtype=jnp.int32)
    c_ar = jnp.arange(C, dtype=jnp.int32)
    rows = jnp.arange(q)

    if mode.startswith("fori"):
        # static-trip variant of the gather loop: is the data-dependent
        # while_loop itself the wall?
        trips = int(mode[4:])

        def fbody(ci, carry):
            out, cnt = carry
            gid = lax.dynamic_slice(order, (jnp.int32(0), ci), (q, 1))
            leaf_ids = jnp.minimum(gid * C + c_ar[None, :], L)
            s = leaf_start[leaf_ids]
            lc = leaf_count[leaf_ids]
            pos = s[..., None] + m_ar[None, None, :]
            valid0 = m_ar[None, None, :] < lc[..., None]
            pos = jnp.where(valid0, pos, 0)
            pts = points_perm[pos]
            diff = pts - queries[:, None, None, :]
            rd = jnp.sum(diff * diff, axis=-1)
            cnt = cnt + jnp.sum(rd, axis=(1, 2)).astype(jnp.int32)
            return out, cnt

        init = (jnp.zeros((q, cap), dtype=jnp.int32),
                jnp.zeros((q,), dtype=jnp.int32))
        out, cnt = lax.fori_loop(0, trips, fbody, init)
        return out[:, :1], cnt

    def cond(state):
        ci = state[-1]
        nxt = lax.dynamic_slice(emit_sorted, (jnp.int32(0), ci),
                                (q, 1))[:, 0]
        return (ci < G) & jnp.any(nxt)

    def body(state):
        out, cnt, ci = state
        gid = lax.dynamic_slice(order, (jnp.int32(0), ci), (q, 1))
        leaf_ids = jnp.minimum(gid * C + c_ar[None, :], L)
        s = leaf_start[leaf_ids]
        lc = leaf_count[leaf_ids]
        pos = s[..., None] + m_ar[None, None, :]
        valid0 = m_ar[None, None, :] < lc[..., None]
        pos = jnp.where(valid0, pos, 0)
        pts = points_perm[pos]
        diff = pts - queries[:, None, None, :]
        rd = jnp.sum(diff * diff, axis=-1)
        if mode == "gather":
            cnt = cnt + jnp.sum(rd, axis=(1, 2)).astype(jnp.int32)
            return out, cnt, ci + 1
        taken = jnp.take_along_axis(take_pad, leaf_ids, axis=1)
        scanned = jnp.take_along_axis(scan_pad, leaf_ids, axis=1)
        valid = valid0 & (taken | scanned)[..., None]
        accept = valid & (taken[..., None] | (rd < rr))
        accept = accept.reshape(q, C * max_leaf)
        if mode == "counts":
            cnt = cnt + jnp.sum(accept, axis=1).astype(jnp.int32)
            return out, cnt, ci + 1
        ids = orig_ids[pos].reshape(q, C * max_leaf)
        cols = cnt[:, None] + jnp.cumsum(accept, axis=1) - 1
        cols = jnp.where(accept, cols, cap)
        out = out.at[rows[:, None], cols].set(ids, mode="drop")
        cnt = cnt + jnp.sum(accept, axis=1).astype(jnp.int32)
        return out, cnt, ci + 1

    init = (jnp.full((q, cap), -1, dtype=jnp.int32),
            jnp.zeros((q,), dtype=jnp.int32),
            jnp.int32(0))
    out, cnt, _ = lax.while_loop(cond, body, init)
    return out, cnt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from petal_neighbors_tpu import BallTree
    from petal_neighbors_tpu.utils.validation import check_query_batch

    rng = np.random.default_rng(4)
    pts = rng.normal(size=(n, 2)).astype(np.float32)
    qs_np = pts[:q]
    tree = BallTree.euclidean(pts)
    qs = check_query_batch(qs_np, tree.dim, tree.points.dtype)
    args = (tree._points_perm, tree._orig_ids, tree._centroids, tree._radii,
            qs)
    modes = ("flags", "sortL", "sortG", "fori1", "fori3", "fori9", "gather",
             "counts", "full")

    for eps in (0.05,):
        fns = {m: functools.partial(probe, *args, eps, shape=tree._shape,
                                    metric=tree.metric, mode=m, C=C)
               for m in modes}
        # warm all
        for fn in fns.values():
            jax.tree_util.tree_map(np.asarray, fn())
        best = {m: np.inf for m in modes}
        for _ in range(3):           # interleaved sweeps
            for m, fn in fns.items():
                t0 = time.perf_counter()
                jax.tree_util.tree_map(np.asarray, fn())
                best[m] = min(best[m], time.perf_counter() - t0)
        say(f"eps={eps} C={C}: " + "  ".join(
            f"{m}={v*1e3:.1f}ms" for m, v in best.items()))


if __name__ == "__main__":
    main()
