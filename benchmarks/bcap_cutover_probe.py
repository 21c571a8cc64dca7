"""Round-4 probe: bcap vs capped e2e across k — routing cutover.

BENCH r4 showed k=100 regressing 34.9k -> 16.4k QPS when the bcap
routing captured it (kb = k + slack block ids, each 16 rows, makes the
slab rescore gather k-linear at 16x the row count).  This sweeps both
schemes at the headline corpus to place the auto-routing boundary.

Usage: python benchmarks/bcap_cutover_probe.py
"""

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


def wall(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    n, dim, q = 1_000_000, 128, 10_240
    print(f"[probe] devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(7)
    pts = (rng.random((n, dim), dtype=np.float32) * 255.0)
    qs = (rng.random((q, dim), dtype=np.float32) * 255.0)

    from petal_neighbors_tpu.ops.pallas.knn_kernel import (
        prepare_split, prepare_bcap_planes, bcap_tile_n)
    from petal_neighbors_tpu.ops import bruteforce as bf

    btn = bcap_tile_n(dim)
    mu = np.asarray(bf.center_of(pts))
    qs_c = jnp.asarray(qs - mu)
    ppad, pnorm = bf.pad_for_pallas(jnp.asarray(pts - mu))
    split = prepare_split(ppad)
    planes = prepare_bcap_planes(ppad, pnorm, tn=btn)
    np.asarray(planes[1])

    for k in (10, 24, 48, 90, 120):
        def run_capped(qq, kk=k):
            return bf.knn_pallas_prepadded(ppad, pnorm, qq, kk, n_real=n,
                                           precision="high",
                                           pts_split=split, scheme="capped")

        def run_bcap(qq, kk=k):
            return bf.knn_pallas_prepadded(ppad, pnorm, qq, kk, n_real=n,
                                           precision="high", pts_split=split,
                                           scheme="bcap", bcap_planes=planes,
                                           bcap_tn=btn)

        t_c, _ = wall(run_capped, qs_c)
        t_b, _ = wall(run_bcap, qs_c)
        print(f"[k={k:4d}] capped {q/t_c:8,.0f} qps | bcap {q/t_b:8,.0f} qps",
              flush=True)


if __name__ == "__main__":
    main()
