"""Round-3 probe: capped-pass kernel vs fold at the headline shape.

Measures kernel-only QPS (k_scan=18, 'high') for fold vs capped at
several pass counts, then end-to-end knn_pallas_prepadded (scheme
capped vs fold) including rescore + proof, and checks exactness + the
proof's coverage (a fallback would show up as a QPS collapse).

Usage: python benchmarks/capped_probe.py [n] [dim] [q]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 10_240

    print(f"[probe] devices={jax.devices()}")
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (n, dim)).astype(np.float32)
    qs = rng.uniform(0, 1, (q, dim)).astype(np.float32)

    from petal_neighbors_tpu.ops.pallas.knn_kernel import (knn_pallas,
                                                           prepare_split)
    from petal_neighbors_tpu.ops import bruteforce as bf

    mu = np.asarray(bf.center_of(pts))
    pts_c = jnp.asarray(pts - mu)
    qs_c = jnp.asarray(qs - mu)
    ppad, pnorm = bf.pad_for_pallas(pts_c)
    split = prepare_split(ppad)
    flops = 2.0 * q * n * dim
    k_scan = 18

    t, (df, if_) = wall(lambda: knn_pallas(
        ppad, qs_c, pnorm, k=k_scan, precision="high", points_split=split,
        sort_output=False, scheme="fold"))
    print(f"[kernel fold        ] {t*1e3:8.1f} ms  {flops/t/1e12:6.2f} TF/s"
          f"  {q/t:9.0f} qps")
    ref = np.sort(np.asarray(if_), 1)

    for tq, tn, passes in ((256, 4096, 2), (512, 4096, 2), (256, 2048, 2),
                           (512, 2048, 2), (512, 8192, 2), (512, 4096, 1)):
        if ppad.shape[0] % tn:
            continue
        t, (dc, ic, thr) = wall(lambda p=passes, tq=tq, tn=tn: knn_pallas(
            ppad, qs_c, pnorm, k=k_scan, tq=tq, tn=tn, precision="high",
            points_split=split, scheme="capped", passes=p))
        ic = np.asarray(ic)
        # candidate-set agreement with fold (not required to be 1.0 —
        # the proof covers misses — but shows the miss rate)
        match = float(np.mean(np.sort(ic, 1) == ref))
        print(f"[kernel capped tq={tq:3d} tn={tn:4d} E={passes}] "
              f"{t*1e3:8.1f} ms  {flops/t/1e12:6.2f} TF/s  {q/t:9.0f} qps"
              f"  match={match:.4f}")

    # end-to-end (rescore + proof + possible fallback)
    for scheme in ("fold", "capped"):
        t, (d, i) = wall(lambda s=scheme: bf.knn_pallas_prepadded(
            ppad, pnorm, qs_c, 10, n, precision="high", scheme=s,
            pts_split=split))
        print(f"[e2e {scheme:7s}       ] {t*1e3:8.1f} ms  {q/t:9.0f} qps")
        if scheme == "fold":
            e2e_ref = np.asarray(i)
        else:
            print(f"    ids match fold: "
                  f"{float(np.mean(np.asarray(i) == e2e_ref)):.6f}")


if __name__ == "__main__":
    main()
