"""Round-5 probe: 1M-scale dual-tree join end-to-end.

The r3 sweep-based join ran 319 s at 1M x 8-d; round 4 routed high-dim
joins through the fused serving kernel (trees/dual.py:_join_via_kernel,
~20x claimed) and rewrote the low-dim sweep as compacting bounded
rounds — neither was re-measured at 1M.  This probe records both:

  * 1M x 8-d self-join k=5 (kernel route, the HDBSCAN shape)
  * 300k x 2-d self-join k=5 (sweep route — the compacting-rounds path)

Exactness: a 64-row f64 oracle subset per run.

Usage: python -u benchmarks/dual_probe.py [n_hi] [n_lo]
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


def oracle_rows(pts, rows, k):
    p64 = pts.astype(np.float64)
    d = ((p64[rows][:, None, :] - p64[None, :, :]) ** 2).sum(-1)
    return np.sort(d, axis=1)[:, :k] ** 0.5


def run(n, dim, k):
    from petal_neighbors_tpu import BallTree
    from petal_neighbors_tpu.trees.dual import dual_tree_knn

    rng = np.random.default_rng(0xD0A1)
    pts = rng.random((n, dim), dtype=np.float32)
    t0 = time.perf_counter()
    tree = BallTree.euclidean(pts)
    build_s = time.perf_counter() - t0
    say(f"n={n} dim={dim}: build {build_s:.1f} s")

    t0 = time.perf_counter()
    d, i = dual_tree_knn(tree, tree, k)
    d_host = np.asarray(d)
    join_s = time.perf_counter() - t0
    say(f"n={n} dim={dim}: join k={k} {join_s:.1f} s "
        f"({n / join_s / 1e3:.1f}k rows/s)")

    rows = np.arange(0, n, max(1, n // 64))[:64]
    od = oracle_rows(pts, rows, k)
    bad = np.abs(d_host[rows] - od) > 1e-3 * (1.0 + od)
    say(f"  oracle rows: {int(bad.sum())}/{od.size} distance mismatches")
    assert not bad.any()
    return build_s, join_s


def main():
    n_hi = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    say(f"device={jax.devices()[0].platform}")
    run(n_hi, 8, 5)       # kernel route (dim > 3)
    run(n_lo, 2, 5)       # sweep route (compacting rounds)


if __name__ == "__main__":
    main()
