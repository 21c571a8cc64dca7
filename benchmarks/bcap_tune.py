"""Round-4 tune: bcap e2e vs (tn, kb) at the headline shape.

The bcap kernel's candidate set is kb blocks x (tn/128) rows; the slab
rescore cost scales with kb*tn while the kernel's matmul cost is
tn-invariant — smaller tn trades grid steps for rescore bytes.  kb
trades threshold tightness (repair probability) for candidate count.

Usage: python benchmarks/bcap_tune.py [n] [dim] [q] [k]
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


def wall(fn, *args, reps=4):
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 10_240
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    print(f"[tune] devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(7)
    pts = rng.random((n, dim), dtype=np.float32) * 255.0
    qs = rng.random((q, dim), dtype=np.float32) * 255.0

    from petal_neighbors_tpu.ops.pallas.knn_kernel import (
        prepare_split, prepare_bcap_planes)
    from petal_neighbors_tpu.ops import bruteforce as bf

    mu = np.asarray(bf.center_of(pts))
    qs_c = jnp.asarray(qs - mu)

    # oracle once (512-query f64)
    n_or = 512
    q64 = qs[:n_or].astype(np.float64)
    qn = (q64 * q64).sum(1)[:, None]
    bd = np.full((n_or, k), np.inf)
    bi = np.full((n_or, k), -1, dtype=np.int64)
    for s in range(0, n, 131072):
        p64 = pts[s:s + 131072].astype(np.float64)
        d = qn + (p64 * p64).sum(1)[None] - 2.0 * (q64 @ p64.T)
        cd = np.concatenate([bd, d], 1)
        ci = np.concatenate([bi, np.broadcast_to(
            np.arange(s, s + len(p64)), (n_or, len(p64)))], 1)
        take = np.argpartition(cd, k - 1, 1)[:, :k]
        bd = np.take_along_axis(cd, take, 1)
        bi = np.take_along_axis(ci, take, 1)
    oi = bi

    for tn in (4096, 2048, 1024):
        ppad, pnorm = bf.pad_for_pallas(jnp.asarray(pts - mu), tn=tn)
        split = prepare_split(ppad)
        planes = prepare_bcap_planes(ppad, pnorm, tn=tn)
        np.asarray(planes[1])

        def run(qq):
            return bf.knn_pallas_prepadded(
                ppad, pnorm, qq, k, n_real=n, precision="high",
                tn=tn, pts_split=split, scheme="bcap",
                bcap_planes=planes)

        t, (dd, ii) = wall(run, qs_c)
        ii_n = np.asarray(ii)[:n_or]
        rec = sum(len(set(a.tolist()) & set(b.tolist()))
                  for a, b in zip(ii_n, oi)) / oi.size
        print(f"[e2e] tn={tn}: {q/t:,.0f} qps recall={rec:.6f}",
              flush=True)
        del ppad, pnorm, split, planes


if __name__ == "__main__":
    main()
