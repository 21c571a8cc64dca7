"""Round-4 probe: config4 radius A/B — per-query vs tiled frontier.

Same measurement window per epsilon (interleaved reps) so tunnel
variance cannot flip the comparison.  Also sweeps chunk_leaves and
tile_q for the tiled scheme.

``dim`` > 2 gives a SCATTERED-emission workload (round-4 advisor
finding): at dim 8 the tree's leaf-id order correlates weakly with
spatial adjacency, so a query's emitted leaves no longer cluster into
consecutive groups — the regime where the group-granularity ordering
(C leaves per sorted group) could pay up to ~C x the gather work of the
r3 per-leaf sort.  Run both dims to check the C > 1 default survives.

Usage: python -u benchmarks/radius_ab_probe.py [n] [q] [dim]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def say(msg):
    print(msg, flush=True)


def wall(fn, reps=3):
    out = fn()
    np.asarray(out[0])  # warm + sync
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from petal_neighbors_tpu import BallTree
    from petal_neighbors_tpu.trees import ball_query

    rng = np.random.default_rng(4)
    pts = rng.normal(size=(n, dim)).astype(np.float32)
    qs_np = pts[:q]
    tree = BallTree.euclidean(pts)
    from petal_neighbors_tpu.utils.validation import check_query_batch
    from petal_neighbors_tpu.ops.bruteforce import _pick_chunk
    qs = check_query_batch(qs_np, tree.dim, tree.points.dtype)
    chunk = _pick_chunk(tree.n, q, tree.dim, None, direct=True)

    import functools
    for eps in (0.01, 0.05, 0.2):
        variants = {
            "per_query": functools.partial(
                ball_query.radius_query_capped,
                tree._points_perm, tree._orig_ids, tree._centroids,
                tree._radii, qs, eps, shape=tree._shape, metric=tree.metric,
                cap=512, point_chunk=chunk),
            # chunk_leaves=1 == the r3 per-LEAF sort ordering (groups of
            # one): the baseline the group scheme is justified against
            "per_query_C1": functools.partial(
                ball_query.radius_query_capped,
                tree._points_perm, tree._orig_ids, tree._centroids,
                tree._radii, qs, eps, shape=tree._shape, metric=tree.metric,
                cap=512, chunk_leaves=1, point_chunk=chunk),
        }
        for cl in (4, 8, 16):
            for tq in (128, 256):
                variants[f"tiled_C{cl}_tq{tq}"] = functools.partial(
                    ball_query.radius_query_capped_tiled,
                    tree._points_perm, tree._orig_ids, tree._centroids,
                    tree._radii, qs, eps, shape=tree._shape,
                    metric=tree.metric, cap=512, chunk_leaves=cl,
                    tile_q=tq, point_chunk=chunk)
        res = {}
        outs = {}
        for name, fn in variants.items():
            dt, out = wall(fn)
            res[name] = q / dt
            outs[name] = (np.asarray(out[0]), np.asarray(out[1]))
        ref_ids, ref_cnt = outs["per_query"]
        for name, (ids, cnt) in outs.items():
            assert (cnt == ref_cnt).all(), (name, "count mismatch")
            for row in range(0, q, 777):
                a = set(ids[row][ids[row] >= 0])
                b = set(ref_ids[row][ref_ids[row] >= 0])
                assert a == b, (name, row)
        say(f"eps={eps}: " + "  ".join(
            f"{k}={v/1e3:.1f}k" for k, v in res.items()))


if __name__ == "__main__":
    main()
