"""Round-5 probe: the two-phase block-capped scheme ("bcap2") at the
headline shape (VERDICT r4 item 1 — the named "deferred cross-chunk
merge" lever).

Stages measured separately (each its own jitted program) and e2e:
  A. bcap_minima alone (the fully-pipelined floor candidate)
  B. lax.top_k over the (Q, N/B) minima matrix
  C. e2e knn_pallas_prepadded(scheme="bcap2") with recall vs f64 oracle
  D. e2e bcap (the r4/r5 in-kernel scheme) at its best config, same data
  E. k=100 through bcap2 (VERDICT item 3)

Sweep axes: granule g (block B = g/128 rows per minima column — sets
both the matrix width and the slab-rescore cost) x kernel tile.

Usage: python benchmarks/bcap2_probe.py [n] [dim] [q] [k]
"""

import functools
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


def wall(fn, reps=4):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0][:1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0][:1])
        best = min(best, time.perf_counter() - t0)
    return best, out


def sustained(fn, depth=6, reps=3):
    outs = [fn() for _ in range(2)]
    [np.asarray(jax.tree.leaves(o)[0][:1]) for o in outs]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(depth)]
        for o in outs:
            np.asarray(jax.tree.leaves(o)[0][:1])
        best = min(best, (time.perf_counter() - t0) / depth)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 10_240
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    say(f"[bcap2] devices={jax.devices()}")
    rng = np.random.default_rng(7)
    pts = rng.random((n, dim), dtype=np.float32) * 255.0
    qs = rng.random((q, dim), dtype=np.float32) * 255.0

    from petal_neighbors_tpu.ops.pallas.knn_kernel import (
        bcap_minima, prepare_bcap_planes)
    from petal_neighbors_tpu.ops import bruteforce as bf

    mu = np.asarray(bf.center_of(pts))
    qs_dev = jnp.asarray(qs)
    qs_c = jnp.asarray(qs - mu)

    import torch

    def oracle_ids(nq, kk):
        q64 = torch.from_numpy(qs[:nq]).double()
        part_d, part_i = [], []
        for s in range(0, n, 131072):
            p64 = torch.from_numpy(
                np.ascontiguousarray(pts[s:s + 131072])).double()
            d = (p64 * p64).sum(1)[None, :] - 2.0 * (q64 @ p64.T)
            dd, ii = torch.topk(d, kk, dim=1, largest=False)
            part_d.append(dd)
            part_i.append(ii + s)
        cd = torch.cat(part_d, 1)
        ci = torch.cat(part_i, 1)
        _, take = torch.topk(cd, kk, dim=1, largest=False)
        return torch.gather(ci, 1, take).numpy()

    n_or = 512
    oracle = oracle_ids(n_or, k)

    def recall(ids, orc):
        m = orc.shape[0]
        ids = np.asarray(ids)[:m]
        hits = sum(len(set(a.tolist()) & set(b.tolist()))
                   for a, b in zip(ids, orc))
        return hits / orc.size

    tn_pad = bf.pad_granule(dim)
    ppad, pnorm = bf.pad_for_pallas(jnp.asarray(pts) - mu, tn=tn_pad)
    np.asarray(pnorm[:1])

    planes = {}
    for g in (2048, 4096, 16384):
        planes[g] = prepare_bcap_planes(ppad, pnorm, tn=g, precision="high")
        np.asarray(planes[g][1][:1])
        say(f"  planes g={g} ready")

    say("--- A: minima kernel alone (floor candidate) ---")
    for g, tile in ((2048, 8192), (2048, 16384), (4096, 16384),
                    (16384, 16384)):
        p_perm, xn_perm = planes[g]
        fn = functools.partial(bcap_minima, p_perm, qs_c, xn_perm,
                               tq=256, tn=tile, granule=g,
                               precision="high")
        try:
            dt, m = wall(fn)
            nc = m.shape[1]
            say(f"  g={g:5d} tile={tile:5d}: {dt*1e3:7.1f} ms "
                f"({q/dt/1e3:6.1f}k QPS-equiv, nc={nc})")
        except Exception as exc:
            say(f"  g={g:5d} tile={tile:5d}: FAILED {type(exc).__name__}: "
                f"{exc}")

    say("--- B: lax.top_k over the minima matrix ---")
    for g in (2048, 4096, 16384):
        p_perm, xn_perm = planes[g]
        m = bcap_minima(p_perm, qs_c, xn_perm, tq=256, tn=16384,
                        granule=g, precision="high")
        np.asarray(m[:1, :1])
        kb = k + 8
        fn = jax.jit(lambda mm: jax.lax.top_k(-mm, kb)[1])
        try:
            dt, _ = wall(lambda: fn(m))
            say(f"  g={g:5d} (nc={m.shape[1]}): top_k(kb={kb}) "
                f"{dt*1e3:7.1f} ms")
        except Exception as exc:
            say(f"  g={g:5d}: FAILED {type(exc).__name__}: {exc}")
        del m

    say("--- C: bcap2 e2e (k=%d) ---" % k)
    best = None
    for g, tile in ((2048, 8192), (2048, 16384), (4096, 16384),
                    (16384, 16384)):
        fn = functools.partial(
            bf.knn_pallas_prepadded, ppad, pnorm, qs_dev, k, n,
            jnp.asarray(mu), precision="high", scheme="bcap2",
            bcap_planes=planes[g], bcap_tn=g, bcap_tile=tile)
        try:
            dt, out = wall(fn)
            rc = recall(out[1], oracle)
            say(f"  g={g:5d} tile={tile:5d}: e2e {q/dt/1e3:7.1f}k QPS  "
                f"recall {rc:.4f}")
            if rc == 1.0 and (best is None or dt < best[0]):
                best = (dt, g, tile)
        except Exception as exc:
            say(f"  g={g:5d} tile={tile:5d}: FAILED {type(exc).__name__}: "
                f"{exc}")
    if best is not None:
        _, g, tile = best
        fn = functools.partial(
            bf.knn_pallas_prepadded, ppad, pnorm, qs_dev, k, n,
            jnp.asarray(mu), precision="high", scheme="bcap2",
            bcap_planes=planes[g], bcap_tn=g, bcap_tile=tile)
        dt_s = sustained(fn)
        say(f"  sustained (depth 6) at g={g} tile={tile}: "
            f"{q/dt_s/1e3:.1f}k QPS")

    say("--- D: bcap e2e reference (g=2048 tile=2048 / 8192) ---")
    for g, tile in ((2048, 2048), (2048, 8192)):
        fn = functools.partial(
            bf.knn_pallas_prepadded, ppad, pnorm, qs_dev, k, n,
            jnp.asarray(mu), precision="high", scheme="bcap",
            bcap_planes=planes[g], bcap_tn=g, bcap_tile=tile)
        try:
            dt, out = wall(fn)
            say(f"  bcap g={g} tile={tile:5d}: e2e {q/dt/1e3:7.1f}k QPS  "
                f"recall {recall(out[1], oracle):.4f}")
        except Exception as exc:
            say(f"  bcap g={g} tile={tile}: FAILED {type(exc).__name__}: "
                f"{exc}")

    say("--- E: k=100 via bcap2 ---")
    oracle100 = oracle_ids(256, 100)
    for g, tile in ((2048, 16384), (4096, 16384)):
        fn = functools.partial(
            bf.knn_pallas_prepadded, ppad, pnorm, qs_dev, 100, n,
            jnp.asarray(mu), precision="high", scheme="bcap2",
            bcap_planes=planes[g], bcap_tn=g, bcap_tile=tile)
        try:
            dt, out = wall(fn, reps=2)
            say(f"  g={g:5d} tile={tile:5d}: k=100 e2e {q/dt/1e3:7.1f}k "
                f"QPS  recall {recall(out[1], oracle100):.4f}")
        except Exception as exc:
            say(f"  g={g:5d} tile={tile:5d}: FAILED {type(exc).__name__}: "
                f"{exc}")


if __name__ == "__main__":
    main()
