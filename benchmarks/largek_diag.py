"""Stage breakdown for the large-k capped path: kernel / rescore / full.

Usage: python -u benchmarks/largek_diag.py [k] [q] [tn,tn2,...] [passes,...]
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


def say(m):
    print(m, flush=True)


def wall(fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    c = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best, c, out


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    tns = ([int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3
           else [4096, 2048])
    plist = ([int(x) for x in sys.argv[4].split(",")] if len(sys.argv) > 4
             else [])
    n, dim = 1_000_000, 128

    say(f"[diag] k={k} q={q} n={n}")
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (n, dim)).astype(np.float32)
    qs = rng.uniform(0, 1, (q, dim)).astype(np.float32)

    from petal_neighbors_tpu.ops import bruteforce as bf
    from petal_neighbors_tpu.ops.pallas.knn_kernel import (knn_pallas,
                                                           prepare_split)
    from petal_neighbors_tpu.ops.pallas.sort_kernel import bitonic_sort_pairs

    mu = np.asarray(bf.center_of(pts))
    qs_c = jnp.asarray(qs - mu)
    ppad, pnorm = bf.pad_for_pallas(jnp.asarray(pts - mu))
    split = prepare_split(ppad)

    k_scan = min(k + bf.RESCORE_SLACK, n)
    if k_scan > 1024:
        k_scan = min(max(-(-k_scan // 128) * 128, 128), 4096)

    for tn in tns:
        if ppad.shape[0] % tn:
            continue
        lam = k_scan * tn / n
        auto_p = min(48, int(np.ceil(lam + 3.0 * lam ** 0.5 + 2.0)))
        budgets = plist or sorted({max(2, auto_p // 2), auto_p})
        for tq in (128, 256) if k_scan <= 1024 else (64, 128):
            for p in budgets:
                try:
                    t, c, (rd, idx, thr) = wall(
                        lambda p=p, tq=tq, tn=tn: knn_pallas(
                            ppad, qs_c, pnorm, k=k_scan, tq=tq, tn=tn,
                            precision="high", points_split=split,
                            scheme="capped", passes=p))
                except Exception as e:
                    say(f"  [kern tn={tn} tq={tq:3d} P={p:2d}] FAIL "
                        f"{type(e).__name__}: {str(e)[:90]}")
                    continue
                say(f"  [kern tn={tn} tq={tq:3d} P={p:2d}] {t*1e3:8.1f} ms "
                    f"{q/t:8.0f} qps  (compile {c:.0f}s)")

    # rescore cost alone (ids from the last kernel run); NB pass ppad as
    # an ARGUMENT — closing over it embeds a 500 MB constant in the HLO
    idx_ok = jnp.where(idx < n, idx, -1)
    f = jax.jit(lambda pp, qq, ii: bf._rescore_large(pp, qq, ii, k, False))
    t, c, _ = wall(f, ppad, qs_c, idx_ok)
    say(f"  [rescore_large     ] {t*1e3:8.1f} ms {q/t:8.0f} qps")
    # bitonic sort alone
    f2 = jax.jit(lambda r, i: bitonic_sort_pairs(r, i))
    t, c, _ = wall(f2, rd, idx)
    say(f"  [bitonic sort only ] {t*1e3:8.1f} ms {q/t:8.0f} qps")

    # full e2e (auto)
    t, c, _ = wall(lambda: bf.knn_pallas_prepadded(
        ppad, pnorm, qs_c, k, n, precision="high", scheme="capped",
        pts_split=split))
    say(f"  [full e2e auto     ] {t*1e3:8.1f} ms {q/t:8.0f} qps")


if __name__ == "__main__":
    main()
