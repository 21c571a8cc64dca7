"""Round-4 probe: end-to-end HDBSCAN mutual-reachability MST timing.

Round-3 judge item #2's done-criterion: 1M x 8-d MST <= 120 s with the
weight multiset identical to the r3 path (which matched the dense scipy
oracle at small n).  Stage split: core distances (now routed through the
fused Pallas kernel, c06d0f2) vs the Boruvka scan rounds vs host
union-find.

Usage: python -u benchmarks/mst_probe.py [n] [dim] [k] [scheme]

``scheme`` (default "scan"): "scan" stages the treeless pipeline with a
per-stage split; "dual" / "auto" run the public
``mutual_reachability_mst`` end-to-end (the dim<=3 tree route) — the
round-5 A/B for the low-dim rounds (VERDICT item 6).
"""

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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    scheme = sys.argv[4] if len(sys.argv) > 4 else "scan"

    from petal_neighbors_tpu.trees import boruvka
    from petal_neighbors_tpu.utils.validation import check_points
    import jax.numpy as jnp

    rng = np.random.default_rng(0xB0)
    pts = rng.random((n, dim), dtype=np.float32)
    say(f"n={n} dim={dim} k={k} scheme={scheme} "
        f"device={jax.devices()[0].platform}")

    if scheme != "scan":
        t0 = time.perf_counter()
        us, vs, ws = boruvka.mutual_reachability_mst(pts, k, scheme=scheme)
        total = time.perf_counter() - t0
        say(f"TOTAL MST ({scheme}): {total:.1f} s  (edges={len(us)}, "
            f"weight_sum={float(np.sum(ws)):.6f})")
        print({"n": n, "dim": dim, "k": k, "scheme": scheme,
               "total_s": round(total, 1),
               "weight_sum": float(np.sum(ws))})
        return

    pts_dev = check_points(pts)
    np.asarray(pts_dev[:1])  # sync the upload

    t0 = time.perf_counter()
    core = boruvka._core_distances(pts_dev, k=k)
    core_host = np.asarray(core)
    t_core = time.perf_counter() - t0
    say(f"core distances (fused-kernel route): {t_core:.1f} s")

    t0 = time.perf_counter()
    round_fn = lambda comp: boruvka._scan_round(pts_dev, core, comp)  # noqa: E731
    us, vs, ws = boruvka._run_rounds(n, round_fn,
                                     np.arange(n, dtype=np.int64))
    t_rounds = time.perf_counter() - t0
    say(f"scan rounds + union-find: {t_rounds:.1f} s")
    total = t_core + t_rounds
    say(f"TOTAL MST: {total:.1f} s  (edges={len(us)}, "
        f"weight_sum={float(np.sum(ws)):.6f})")

    # exactness spot check at small n is in tests; here pin the weight sum
    # so cross-round comparisons are meaningful.
    print({"n": n, "dim": dim, "k": k, "core_s": round(t_core, 1),
           "rounds_s": round(t_rounds, 1), "total_s": round(total, 1),
           "weight_sum": float(np.sum(ws))})


if __name__ == "__main__":
    main()
