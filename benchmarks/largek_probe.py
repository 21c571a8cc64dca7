"""Round-3 probe: large-k serving sweep (capped vs fold/merge).

The round-2 judge targets: k=256/512/1000 at >= 3x the r2 e2e numbers
(5.1k/3.3k/1.8k QPS at the 1M x 128 / 2048-query shape) and k=4080 at
>= 5k QPS.  The capped-pass scheme now scales its pass budget with the
expected per-tile survivor count (static-trip fori_loop past 8 passes so
Mosaic compile time stays sane); this probe measures e2e QPS per k,
exactness vs a f64 oracle subset, and optionally kernel-only times.

Usage: python -u benchmarks/largek_probe.py [n] [dim] [q] [k1,k2,...]
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


def say(msg):
    print(msg, flush=True)


def wall(fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    say(f"    (compile+first run {time.perf_counter()-t0:.1f} s)")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def oracle_check(pts, qs, d_out, i_out, k, nq=64, chunk=131072):
    """Chunked-matmul f64 oracle over the first nq queries."""
    q64 = np.asarray(qs[:nq], dtype=np.float64)
    qn = (q64 * q64).sum(1)[:, None]
    best = np.full((nq, k), np.inf)
    for s0 in range(0, len(pts), chunk):
        p64 = np.asarray(pts[s0:s0 + chunk], dtype=np.float64)
        d = qn + (p64 * p64).sum(1)[None, :] - 2.0 * (q64 @ p64.T)
        cand = np.concatenate([best, d], axis=1)
        part = np.partition(cand, k - 1, axis=1)[:, :k]
        best = part
    od = np.sqrt(np.maximum(np.sort(best, axis=1), 0.0))
    got = np.asarray(d_out[:nq], dtype=np.float64)
    return int((~np.isclose(got, od, rtol=1e-4, atol=1e-4)).any(1).sum())


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    ks = ([int(x) for x in sys.argv[4].split(",")] if len(sys.argv) > 4
          else [256, 512, 1000, 2048, 4080])

    say(f"[probe] devices={jax.devices()} n={n} dim={dim} q={q}")
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (n, dim)).astype(np.float32)
    qs = rng.uniform(0, 1, (q, dim)).astype(np.float32)

    from petal_neighbors_tpu.ops import bruteforce as bf
    from petal_neighbors_tpu.ops.pallas.knn_kernel import prepare_split

    mu = np.asarray(bf.center_of(pts))
    pts_c = jnp.asarray(pts - mu)
    qs_c = jnp.asarray(qs - mu)
    ppad, pnorm = bf.pad_for_pallas(pts_c)
    split = prepare_split(ppad)

    for k in ks:
        k_scan = min(k + bf.RESCORE_SLACK, n)
        if k_scan > 1024:
            k_scan = min(max(-(-k_scan // 128) * 128, 128), 4096)
        lam = k_scan * 4096 / n
        auto_p = min(48, int(np.ceil(lam + 3.0 * lam ** 0.5 + 2.0)))
        say(f"== k={k} (k_scan={k_scan}, lam={lam:.1f}, passes={auto_p}) ==")
        t, (d, i) = wall(lambda: bf.knn_pallas_prepadded(
            ppad, pnorm, qs_c, k, n, precision="high", scheme="capped",
            pts_split=split))
        say(f"  [e2e capped ] {t*1e3:8.1f} ms {q/t:8.0f} qps")
        bad = oracle_check(pts, qs, np.asarray(d), np.asarray(i), k)
        say(f"  oracle-bad={bad}/64")


if __name__ == "__main__":
    main()
