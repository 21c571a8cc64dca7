"""Round-5 probe: VP batched k-NN through the fused brute kernel
(VERDICT r4 item 7) vs the scan engines at the BASELINE config2 shape.

Measures, per batch size (1k / 4k / 10k queries on a 100k x 2-d corpus,
k=10):
  * scheme="kernel"  (the new route: fused Pallas brute scan + rescore)
  * scheme="tiled"   (tile-shared subtree frontier, r3)
  * scheme="per_query" (best-first chunked scan, r2)
both walls (sequential = per-batch host-synced, sustained = 6 in
flight), recall vs a f64 oracle on 256 queries.

Usage: python benchmarks/vp_kernel_probe.py [n] [dim] [k]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def say(msg):
    print(msg, flush=True)


def wall(fn, reps=4):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def sustained(fn, depth=6, reps=3):
    outs = [fn() for _ in range(2)]
    [np.asarray(jax.tree.leaves(o)[0]) for o in outs]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(depth)]
        for o in outs:
            np.asarray(jax.tree.leaves(o)[0])
        best = min(best, (time.perf_counter() - t0) / depth)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    say(f"[vp_kernel] devices={jax.devices()} n={n} dim={dim} k={k}")
    from petal_neighbors_tpu import VantagePointTree

    rng = np.random.default_rng(3)
    pts = rng.random((n, dim), dtype=np.float32)
    t0 = time.perf_counter()
    vp = VantagePointTree.euclidean(pts)
    say(f"  build {time.perf_counter() - t0:.2f} s "
        f"(kernel route eligible: {vp._kernel_route_ok(4096, k)})")

    for q in (1024, 4096, 10240):
        qs = rng.random((q, dim), dtype=np.float32)
        # f64 oracle on 256 queries
        qq = qs[:256].astype(np.float64)
        dd = ((pts[None].astype(np.float64) - qq[:, None]) ** 2).sum(-1)
        oi = np.argsort(dd, axis=1)[:, :k]

        def recall(ids):
            ids = np.asarray(ids)[:256]
            return sum(len(set(a.tolist()) & set(b.tolist()))
                       for a, b in zip(ids, oi)) / oi.size

        import jax.numpy as jnp
        qs_dev = jnp.asarray(qs)
        np.asarray(qs_dev[:1])
        for scheme in ("kernel", "tiled", "per_query"):
            try:
                fn = functools.partial(vp.query_batch, qs_dev, k,
                                       scheme=scheme)
                dt, out = wall(fn)
                st = sustained(fn)
                say(f"  q={q:6d} {scheme:10s}: seq {q/dt/1e3:7.1f}k QPS  "
                    f"sustained {q/st/1e3:7.1f}k QPS  "
                    f"recall {recall(out[1]):.4f}")
            except Exception as exc:
                say(f"  q={q:6d} {scheme:10s}: FAILED "
                    f"{type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
