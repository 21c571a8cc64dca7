"""Round-4 probe: counting-rank sort vs bitonic network on TPU.

The large-k ascending contract costs ~225 ms per 2048-query batch at
width ~1-2k in the bitonic kernel (lane-permute bound, BENCH_NOTES).
This times both kernels at the large-k rescore shapes.

Usage: python benchmarks/sort_probe.py
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

from petal_neighbors_tpu.ops.pallas.sort_kernel import bitonic_sort_pairs
from petal_neighbors_tpu.ops.pallas.rank_sort_kernel import rank_sort_pairs


def wall(fn, *args, reps=4):
    out = fn(*args)
    np.asarray(out[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    print(f"[probe] devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(3)
    q = 2048
    for n in (520, 1032, 2056, 4096):
        keys = rng.random((q, n), dtype=np.float32)
        vals = rng.integers(0, 1 << 20, (q, n)).astype(np.int32)
        kd, vd = jnp.asarray(keys), jnp.asarray(vals)
        tb, (bd, bi) = wall(lambda a, b: bitonic_sort_pairs(a, b), kd, vd)
        for tq in (8, 16):
            tr, (rd, ri) = wall(lambda a, b, t=tq: rank_sort_pairs(
                a, b, tq=t), kd, vd)
            ok = bool(jnp.all(rd == bd))
            print(f"[n={n:5d}] bitonic {tb*1e3:7.1f} ms | rank(tq={tq}) "
                  f"{tr*1e3:7.1f} ms | match={ok}", flush=True)


if __name__ == "__main__":
    main()
