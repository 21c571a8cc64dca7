"""Diagnose the capped e2e overhead: failing-group count + stage times."""

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
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (n, dim)).astype(np.float32)
    qs = rng.uniform(0, 1, (q, dim)).astype(np.float32)

    from petal_neighbors_tpu.ops.pallas.knn_kernel import (knn_pallas,
                                                           prepare_split)
    from petal_neighbors_tpu.ops import bruteforce as bf
    from petal_neighbors_tpu.ops.topk import rescore_exact

    mu = np.asarray(bf.center_of(pts))
    pts_c = jnp.asarray(pts - mu)
    qs_c = jnp.asarray(qs - mu)
    ppad, pnorm = bf.pad_for_pallas(pts_c)
    split = prepare_split(ppad)
    k_scan, k_eff, tq = 18, 10, 256

    def stage_a(pp, qq, pn, sp):
        rd, idx, thr = knn_pallas(pp, qq, pn, k=k_scan, tq=tq,
                                  precision="high", points_split=sp,
                                  scheme="capped", passes=2)
        return rd, idx, thr

    stage_a = jax.jit(stage_a)
    t, (rd, idx, thr) = wall(stage_a, ppad, qs_c, pnorm, split)
    print(f"[A kernel           ] {t*1e3:8.1f} ms  {q/t:9.0f} qps")

    def stage_b(pp, qq, pn, sp):
        rd, idx, thr = knn_pallas(pp, qq, pn, k=k_scan, tq=tq,
                                  precision="high", points_split=sp,
                                  scheme="capped", passes=2)
        idx_ok = jnp.where(idx < n, idx, -1)
        best_rd, best_i = rescore_exact(pp, qq, idx_ok, k_eff)
        qn = jnp.sum(qq * qq, axis=-1)
        xn_max = jnp.max(jnp.where(jnp.isfinite(pn), pn, 0.0))
        err = bf._proof_err("high", dim, qn, xn_max)
        covered = (best_rd[:, -1] <= thr - err)
        covered = covered | ~jnp.isfinite(best_rd[:, -1])
        ok_g = jnp.all(covered.reshape(-1, tq), axis=1)
        return best_rd, best_i, covered, ok_g

    stage_b = jax.jit(stage_b)
    t, (brd, bi, cov, ok_g) = wall(stage_b, ppad, qs_c, pnorm, split)
    cov = np.asarray(cov); ok_g = np.asarray(ok_g)
    print(f"[B +rescore+proof   ] {t*1e3:8.1f} ms  {q/t:9.0f} qps  "
          f"uncovered_queries={int((~cov).sum())}  "
          f"failing_groups={int((~ok_g).sum())}/{len(ok_g)}")

    t, _ = wall(lambda: bf.knn_pallas_prepadded(
        ppad, pnorm, qs_c, k_eff, n, precision="high", scheme="capped",
        pts_split=split))
    print(f"[C full e2e         ] {t*1e3:8.1f} ms  {q/t:9.0f} qps")


if __name__ == "__main__":
    main()
