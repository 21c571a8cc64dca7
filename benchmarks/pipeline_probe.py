"""Round-4 probe: sequential-sync vs pipelined batch submission.

fetch_probe measured a 31 ms RTT floor for one jitted launch through the
axon tunnel.  Serving walls that sync (np.asarray) after every batch pay
that RTT per batch; a streaming client that keeps >= 2 batches in flight
overlaps it with on-chip compute (JAX async dispatch enqueues without
waiting).  This measures both, at the headline workload.

Usage: python benchmarks/pipeline_probe.py
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


def main():
    n, dim, q, k = 1_000_000, 128, 10_240, 10
    print(f"[probe] devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(7)
    pts = rng.random((n, dim), dtype=np.float32) * 255.0
    qs = rng.random((q, dim), dtype=np.float32) * 255.0

    from petal_neighbors_tpu import BruteForce
    idx = BruteForce.euclidean(pts)
    qd = jnp.asarray(qs)

    d, i = idx.query_batch(qd, k)
    np.asarray(d)

    # sequential: sync after every batch (the bench.py methodology)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        d, i = idx.query_batch(qd, k)
        np.asarray(d)
        best = min(best, time.perf_counter() - t0)
    print(f"[seq] {q/best:,.0f} qps ({best*1e3:.1f} ms/batch)", flush=True)

    # pipelined: keep the queue full, sync once at the end
    for depth in (2, 4, 8):
        t0 = time.perf_counter()
        outs = [idx.query_batch(qd, k) for _ in range(depth)]
        for d, i in outs:
            np.asarray(d)
        dt = time.perf_counter() - t0
        print(f"[pipe x{depth}] {depth*q/dt:,.0f} qps "
              f"({dt*1e3/depth:.1f} ms/batch eff)", flush=True)


if __name__ == "__main__":
    main()
