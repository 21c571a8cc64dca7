"""Round-4 probe: is config4 (capped radius) fetch-bound through the
tunnel?

Times (a) fetching a constant (Q, cap) int32 buffer — pure wire cost;
(b) the full capped radius call synced per batch; (c) the same call with
6 batches in flight (sustained, every result still fetched); (d) the
counts-only form (Q,) int32 output.

Usage: python -u benchmarks/radius_fetch_probe.py [n] [q] [cap]
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


def say(msg):
    print(msg, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    from petal_neighbors_tpu import BallTree
    from petal_neighbors_tpu.trees import ball_query
    from petal_neighbors_tpu.utils.validation import check_query_batch
    from petal_neighbors_tpu.ops.bruteforce import _pick_chunk

    rng = np.random.default_rng(4)
    pts = rng.normal(size=(n, 2)).astype(np.float32)
    qs_np = pts[:q]
    tree = BallTree.euclidean(pts)
    qs = check_query_batch(qs_np, tree.dim, tree.points.dtype)
    chunk = _pick_chunk(tree.n, q, tree.dim, None, direct=True)

    # (a) pure wire cost of the output shape
    buf = jnp.zeros((q, cap), dtype=jnp.int32) + 1
    np.asarray(buf)
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(buf)
        say(f"fetch (q,cap) int32 ({q*cap*4/1e6:.1f} MB): "
            f"{(time.perf_counter()-t0)*1e3:.1f} ms")

    call = functools.partial(
        ball_query.radius_query_capped,
        tree._points_perm, tree._orig_ids, tree._centroids, tree._radii,
        qs, 0.05, shape=tree._shape, metric=tree.metric, cap=cap,
        point_chunk=chunk)

    # (b) per-batch-synced
    out = call()
    np.asarray(out[0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = call()
        np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)
    say(f"synced per batch: {best*1e3:.1f} ms  ({q/best/1e3:.1f}k QPS)")

    # (c) sustained: 6 in flight, every result fetched at the end
    depth, reps = 6, 3
    best_s = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [call() for _ in range(depth)]
        for o in outs:
            np.asarray(o[0])
            np.asarray(o[1])
        best_s = min(best_s, (time.perf_counter() - t0) / depth)
    say(f"sustained (6 in flight): {best_s*1e3:.1f} ms/batch "
        f"({q/best_s/1e3:.1f}k QPS)")

    # (d) counts-only output (the DBSCAN core-point test)
    call_c = functools.partial(
        ball_query.radius_query_capped,
        tree._points_perm, tree._orig_ids, tree._centroids, tree._radii,
        qs, 0.05, shape=tree._shape, metric=tree.metric, cap=1,
        point_chunk=chunk)
    out = call_c()
    np.asarray(out[1])
    best_c = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = call_c()
        np.asarray(out[1])
        best_c = min(best_c, time.perf_counter() - t0)
    say(f"counts-only synced: {best_c*1e3:.1f} ms ({q/best_c/1e3:.1f}k QPS)")


if __name__ == "__main__":
    main()
