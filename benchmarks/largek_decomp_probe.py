"""Round-4 probe: component decomposition of the large-k pipeline.

The e2e walls (largek_probe.py) at 1M x 128 / 2048 q: k=2048 933 ms
(2194 QPS), k=4080 5071 ms (404 QPS).  This times the capped kernel
ALONE (unsorted working set + proof threshold) at the same shapes; the
row-sort stage is measured standalone in sort_probe.py (rank kernel:
706 ms at width 2176, 1686 ms at 4096, 2048 rows).  kernel + sort + the
residual (slab gather + direct rescore + repair + RTT) = the e2e wall —
the decomposition BENCH_NOTES cites for the large-k wall analysis.

Usage: python benchmarks/largek_decomp_probe.py [n] [dim] [q]
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


def wall(fn, reps=3):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 2048

    print(f"[probe] devices={jax.devices()} n={n} dim={dim} q={q}",
          flush=True)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (n, dim)).astype(np.float32)
    qs = rng.uniform(0, 1, (q, dim)).astype(np.float32)

    from petal_neighbors_tpu.ops import bruteforce as bf
    from petal_neighbors_tpu.ops.pallas.knn_kernel import (knn_pallas,
                                                           prepare_split)

    mu = np.asarray(bf.center_of(pts))
    pts_c = jnp.asarray(pts - mu)
    qs_c = jnp.asarray(qs - mu)
    ppad, pnorm = bf.pad_for_pallas(pts_c)
    split = prepare_split(ppad)
    n_pad = ppad.shape[0]

    for k_scan in (2176, 4096):
        lam = k_scan * 4096 / n
        passes = min(48, int(np.ceil(lam + 3.0 * lam ** 0.5 + 2.0)))

        @jax.jit
        def kernel_only(ks=k_scan, p=passes):
            rd, idx, thr = knn_pallas(
                ppad, qs_c, pnorm, k=ks, tq=64, tn=4096,
                precision="high", scheme="capped", passes=p,
                points_split=split, sort_output=False)
            return thr        # tiny fetch; forces the whole kernel

        t = wall(kernel_only)
        print(f"[k_scan={k_scan} passes={passes}] capped kernel only "
              f"{t*1e3:8.1f} ms  ({q/t:6.0f} qps-equiv)", flush=True)

        # gather + direct-form rescore at this candidate width (the
        # _rescore_large body minus its row sort)
        idx_fake = jnp.asarray(
            rng.integers(0, n, (q, k_scan)).astype(np.int32))

        @jax.jit
        def gather_rescore(ix=idx_fake):
            qn = jnp.sum(qs_c * qs_c, axis=1)
            ok = ix >= 0
            ixs = jnp.where(ok, ix, 0)
            chunk = max(1, (1 << 24) // (k_scan * dim)) * 8
            qpad2 = (-q) % chunk
            ixp = jnp.pad(ixs, ((0, qpad2), (0, 0)))
            qsp = jnp.pad(qs_c, ((0, qpad2), (0, 0)))
            qnp_ = jnp.pad(qn, (0, qpad2))
            okp = jnp.pad(ok, ((0, qpad2), (0, 0)))

            def body(args):
                ixc, qc, qnc, okc = args
                cand = ppad[ixc]                       # (c, S, d)
                d = (qnc[:, None]
                     + jnp.sum(cand * cand, axis=-1)
                     - 2.0 * jnp.einsum("cd,csd->cs", qc, cand,
                                        precision=jax.lax.Precision.HIGHEST))
                return jnp.where(okc, d, jnp.inf)

            rd = jax.lax.map(body, (ixp.reshape(-1, chunk, k_scan),
                                    qsp.reshape(-1, chunk, dim),
                                    qnp_.reshape(-1, chunk),
                                    okp.reshape(-1, chunk, k_scan)))
            return rd.reshape(-1, k_scan)[:q]

        t2 = wall(gather_rescore)
        print(f"[k_scan={k_scan}] gather + direct rescore "
              f"{t2*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
