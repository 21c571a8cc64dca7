"""Round-4 probe: host-fetch cost through the axon tunnel.

Every e2e QPS wall in this repo ends with np.asarray(result) — the only
reliable sync through the tunnel (block_until_ready does not wait, see
CLAUDE.md).  This isolates the fetch: time np.asarray on device-resident
arrays of the result sizes the serving paths return, plus a zero-size
sync (pure RTT), so kernel walls can be decomposed into on-chip time +
fetch time.

Usage: python benchmarks/fetch_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print(f"[probe] devices={jax.devices()}", flush=True)
    shapes = [(1, 1), (10240, 1), (10240, 10), (10240, 18), (10240, 128),
              (2048, 2048)]
    for shp in shapes:
        x = jnp.zeros(shp, jnp.float32) + 1.0   # device-resident
        np.asarray(x)
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            np.asarray(x)
            best = min(best, time.perf_counter() - t0)
        mb = x.size * 4 / 1e6
        print(f"[fetch] {str(shp):>14} {mb:8.2f} MB: {best*1e3:7.1f} ms "
              f"({mb/max(best,1e-9):6.1f} MB/s)", flush=True)

    # dispatch+sync of a trivial program (RTT floor for one launch)
    f = jax.jit(lambda a: a + 1.0)
    y = jnp.zeros((8, 8), jnp.float32)
    np.asarray(f(y))
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(f(y))
        best = min(best, time.perf_counter() - t0)
    print(f"[rtt] trivial jit + fetch: {best*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
