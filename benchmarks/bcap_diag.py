"""Round-4 diag: where do the ~17 ms between the bcap kernel (109k QPS)
and e2e (92-94k) go?  Components measured separately on-chip:

  A. kernel-only (block ids + thr) at the e2e tile shape
  B. kernel + slab rescore (no proof/repair)
  C. full e2e at capped_passes in {2, 3, 4}
  D. uncovered-query count per pass budget (does the repair fire?)

Usage: python benchmarks/bcap_diag.py [tn] [n] [dim] [q] [k]
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


def wall(fn, *args, reps=4, **kw):
    out = fn(*args, **kw)
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    tn = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    q = int(sys.argv[4]) if len(sys.argv) > 4 else 10_240
    k = int(sys.argv[5]) if len(sys.argv) > 5 else 10

    print(f"[diag] devices={jax.devices()} tn={tn}", flush=True)
    rng = np.random.default_rng(7)
    pts = rng.random((n, dim), dtype=np.float32) * 255.0
    qs = rng.random((q, dim), dtype=np.float32) * 255.0

    from petal_neighbors_tpu.ops.pallas.knn_kernel import (
        knn_pallas, prepare_split, prepare_bcap_planes, BCAP_LANES)
    from petal_neighbors_tpu.ops import bruteforce as bf
    from petal_neighbors_tpu.ops.bruteforce import (
        _bcap_rescore, _proof_err, RESCORE_SLACK)

    mu = np.asarray(bf.center_of(pts))
    qs_c = jnp.asarray(qs - mu)
    ppad, pnorm = bf.pad_for_pallas(jnp.asarray(pts - mu), tn=tn)
    split = prepare_split(ppad)
    planes = prepare_bcap_planes(ppad, pnorm, tn=tn)
    np.asarray(planes[1])
    block = tn // BCAP_LANES
    kb = min(max(k + RESCORE_SLACK, 12), BCAP_LANES)

    import functools

    @functools.partial(jax.jit, static_argnames=("p",))
    def kern(qq, p):
        return knn_pallas(ppad, qq, planes[1], k=kb, tq=256, tn=tn,
                          precision="high", scheme="bcap", passes=p,
                          points_split=planes[0])

    @functools.partial(jax.jit, static_argnames=("p",))
    def kern_rescore(qq, p):
        _, bix, thr = knn_pallas(ppad, qq, planes[1], k=kb, tq=256, tn=tn,
                                 precision="high", scheme="bcap", passes=p,
                                 points_split=planes[0])
        return _bcap_rescore(ppad, pnorm, qq, bix, k, block)

    for p in (2, 3):
        t, _ = wall(kern, qs_c, p=p)
        print(f"[A] kernel p={p}: {q/t:,.0f} qps", flush=True)
        t, (brd, bi) = wall(kern_rescore, qs_c, p=p)
        print(f"[B] kernel+rescore p={p}: {q/t:,.0f} qps", flush=True)
        # D: how many queries fail the proof?
        _, bix, thr = kern(qs_c, p=p)
        qn = np.asarray(jnp.sum(qs_c * qs_c, axis=-1))
        xnm = float(jnp.max(jnp.where(jnp.isfinite(pnorm), pnorm, 0.0)))
        err = np.asarray(_proof_err("high", dim, jnp.asarray(qn), xnm))
        brd_n = np.asarray(brd)
        covered = brd_n[:, -1] <= np.asarray(thr) - err
        print(f"[D] p={p}: uncovered={int((~covered).sum())} of {q}",
              flush=True)

    def e2e(qq, p):
        return bf.knn_pallas_prepadded(
            ppad, pnorm, qq, k, n_real=n, precision="high", tn=tn,
            pts_split=split, scheme="bcap", bcap_planes=planes,
            capped_passes=p)

    for p in (2, 3, 4):
        t, _ = wall(e2e, qs_c, p)
        print(f"[C] e2e p={p}: {q/t:,.0f} qps", flush=True)


if __name__ == "__main__":
    main()
