"""Round-4 probe: where does bcap e2e lose vs its own kernel?

At the headline (1M x 128, q=10240, k=10, btn=2048) the bcap kernel
alone measured 108.9k QPS and the e2e path 92-94k — this script times
each e2e stage separately to name the binding overhead:

  A. kernel-only (block ids + threshold), passes=2 and 3
  B. kernel + slab rescore (no proof / repair)
  C. rescore alone (block ids precomputed and device-resident)
  D. full e2e (knn_pallas_prepadded scheme='bcap'), passes=2 and 3
  E. uncovered-query count at each pass budget (repair trigger rate)

Usage: python benchmarks/bcap_e2e_probe.py [n] [dim] [q] [k]
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

    print(f"[probe] devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(7)
    pts = (rng.random((n, dim), dtype=np.float32) * 255.0)
    qs = (rng.random((q, dim), dtype=np.float32) * 255.0)

    from petal_neighbors_tpu.ops.pallas.knn_kernel import (
        knn_pallas, prepare_split, prepare_bcap_planes, bcap_tile_n)
    from petal_neighbors_tpu.ops import bruteforce as bf

    btn = bcap_tile_n(dim)
    mu = np.asarray(bf.center_of(pts))
    qs_c = jnp.asarray(qs - mu)
    ppad, pnorm = bf.pad_for_pallas(jnp.asarray(pts - mu), tn=btn)
    split = prepare_split(ppad)
    planes = prepare_bcap_planes(ppad, pnorm, tn=btn)
    np.asarray(planes[1])
    kb = max(k + bf.RESCORE_SLACK, 12)
    block = btn // 128

    # -- A: kernel-only ----------------------------------------------------
    bix_for_c = None
    for passes in (2, 3):
        def f(qq, p=passes):
            return knn_pallas(ppad, qq, planes[1], k=kb, tq=256, tn=btn,
                              precision="high", scheme="bcap", passes=p,
                              points_split=planes[0])
        t, out = wall(f, qs_c)
        if passes == 2:
            bix_for_c = out[1]
        print(f"[A kernel] passes={passes}: {q/t:,.0f} qps "
              f"({t*1e3:.1f} ms)", flush=True)

    # NB: corpus arrays must be jit ARGUMENTS — a closure bakes the
    # 0.5 GB corpus into the HLO as a constant and the tunnel's
    # remote-compile POST rejects/hangs on it (see bcap_probe.py)
    # -- C: rescore alone --------------------------------------------------
    resc = jax.jit(lambda pp, pn, bi, qq: bf._bcap_rescore(
        pp, pn, qq, bi, k, block))
    t, _ = wall(resc, ppad, pnorm, bix_for_c, qs_c)
    print(f"[C rescore] {t*1e3:.1f} ms ({q/t:,.0f} qps-equiv)", flush=True)

    # -- B: kernel + rescore in one program ---------------------------------
    @jax.jit
    def kern_resc(pp, pn, psplit, pxn, qq):
        _, bi, thr = knn_pallas(pp, qq, pxn, k=kb, tq=256, tn=btn,
                                precision="high", scheme="bcap", passes=2,
                                points_split=psplit)
        return bf._bcap_rescore(pp, pn, qq, bi, k, block), thr
    t, ((brd, bi2), thr) = wall(kern_resc, ppad, pnorm, planes[0],
                                planes[1], qs_c)
    print(f"[B kern+rescore] {q/t:,.0f} qps ({t*1e3:.1f} ms)", flush=True)

    # -- E: uncovered counts -----------------------------------------------
    from petal_neighbors_tpu.ops.bruteforce import _proof_err
    qn = jnp.sum(qs_c * qs_c, axis=-1)
    xn_max = jnp.max(jnp.where(jnp.isfinite(pnorm), pnorm, 0.0))
    err = _proof_err("high", dim, qn, xn_max)
    cov = (np.asarray(brd)[:, -1] <= np.asarray(thr) - np.asarray(err))
    print(f"[E uncovered] passes=2: {int((~cov).sum())} of {q}", flush=True)

    # -- D: full e2e --------------------------------------------------------
    for passes in (2, 3):
        def e2e(qq, p=passes):
            return bf.knn_pallas_prepadded(
                ppad, pnorm, qq, k, n_real=n, precision="high",
                pts_split=split, scheme="bcap", bcap_planes=planes,
                capped_passes=p, tn=btn)
        t, _ = wall(e2e, qs_c)
        print(f"[D e2e] passes={passes}: {q/t:,.0f} qps ({t*1e3:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
