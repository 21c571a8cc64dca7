"""Fused-kernel tile/precision sweep on the real TPU.

Measures the knn_pallas kernel (candidate pass only, k_scan = k + slack)
across tile configs and matmul precisions on the SIFT-1M-shaped headline
workload, printing a QPS / effective-TF/s table.  One process = one
sweep (the tunnel serializes clients; data upload is paid once).

Usage: python benchmarks/kernel_tune.py [n] [dim] [q] [k]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def wall(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])          # tunnel-safe sync
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
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 18     # k_scan for k=10

    print(f"[tune] devices={jax.devices()}")
    rng = np.random.default_rng(0)
    n -= n % 15625 if n % 15625 else 0   # keep 8192-chunk reshape simple
    n = (n // 8192) * 8192 if n >= 8192 else n
    pts = rng.uniform(0, 1, (n, dim)).astype(np.float32)
    qs = rng.uniform(0, 1, (q, dim)).astype(np.float32)

    from petal_neighbors_tpu.ops.pallas.knn_kernel import (knn_pallas,
                                                           prepare_split)
    from petal_neighbors_tpu.ops.bruteforce import pad_for_pallas, center_of

    mu = np.asarray(center_of(pts))
    pts_c = jnp.asarray(pts - mu)
    qs_c = jnp.asarray(qs - mu)
    flops = 2.0 * q * n * dim

    # pure-matmul roofline probe: the same data volume through one
    # (q, n) = qs @ pts.T chunked matmul + global min (no top-k), f32
    @jax.jit
    def roofline(a, b):
        chunks = b.reshape(-1, 8192, dim)
        def body(carry, c):
            s = jnp.dot(a, c.T, precision=jax.lax.Precision.HIGHEST)
            return jnp.minimum(carry, jnp.min(s, axis=1)), None
        init = jnp.full((a.shape[0],), jnp.inf, jnp.float32)
        out, _ = jax.lax.scan(body, init, chunks)
        return out

    t, _ = wall(roofline, qs_c, pts_c)
    print(f"[roofline f32-HIGHEST matmul+min] {t*1e3:8.1f} ms  "
          f"{flops/t/1e12:6.2f} TF/s  {q/t:9.0f} qps-equiv")

    @jax.jit
    def roofline_hi(a, b):
        chunks = b.reshape(-1, 8192, dim)
        def body(carry, c):
            s = jnp.dot(a, c.T, precision=jax.lax.Precision.HIGH)
            return jnp.minimum(carry, jnp.min(s, axis=1)), None
        init = jnp.full((a.shape[0],), jnp.inf, jnp.float32)
        out, _ = jax.lax.scan(body, init, chunks)
        return out

    t, _ = wall(roofline_hi, qs_c, pts_c)
    print(f"[roofline HIGH (bf16x3) matmul+min] {t*1e3:6.1f} ms  "
          f"{flops/t/1e12:6.2f} TF/s  {q/t:9.0f} qps-equiv")

    ppad, pnorm = pad_for_pallas(pts_c)
    ref_d = ref_i = None

    configs = []
    for tq in (256, 512, 1024):
        for tn in (1024, 2048, 4096):
            configs.append((tq, tn, None, "highest"))
    for prec in ("high", "bf16"):
        for tq in (256, 512):
            for tn in (2048, 4096, 8192):
                configs.append((tq, tn, None, prec))

    for tq, tn, subtile, prec in configs:
        if ppad.shape[0] % tn or q % tq:
            npad2 = (-ppad.shape[0]) % tn
            pp = jnp.pad(ppad, ((0, npad2), (0, 0)),
                         constant_values=jnp.nan)
            pn2 = jnp.pad(pnorm, (0, npad2), constant_values=jnp.nan)
        else:
            pp, pn2 = ppad, pnorm
        qpad = (-q) % tq
        qq = jnp.pad(qs_c, ((0, qpad), (0, 0)),
                     constant_values=jnp.nan) if qpad else qs_c
        label = f"tq={tq:4d} tn={tn:4d} sub={subtile or tn:4d} prec={prec:7s}"
        split = prepare_split(pp) if prec == "high" else None
        try:
            t, (d, i) = wall(
                lambda pp=pp, pn2=pn2, qq=qq, tq=tq, tn=tn, st=subtile,
                pr=prec, sp=split: knn_pallas(pp, qq, pn2, k=k, tq=tq,
                                              tn=tn, subtile=st,
                                              precision=pr,
                                              points_split=sp))
        except Exception as e:
            print(f"[{label}]  FAILED: {type(e).__name__}: {str(e)[:80]}")
            continue
        d = np.asarray(d[:q]); i = np.asarray(i[:q])
        if ref_d is None and prec == "highest":
            ref_d, ref_i = d, i
            match = 1.0
        else:
            match = float(np.mean(np.sort(i, 1) == np.sort(ref_i, 1))) \
                if ref_i is not None else -1
        print(f"[{label}] {t*1e3:8.1f} ms  {flops/t/1e12:6.2f} TF/s  "
              f"{q/t:9.0f} qps  match={match:.4f}")


if __name__ == "__main__":
    main()
