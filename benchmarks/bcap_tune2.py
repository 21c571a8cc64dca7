"""Round-5 tune: bcap granule/tile decoupling at the headline shape.

The round-4 bcap kernel runs ~70 ms on-chip vs the ~40 ms bf16x3 MXU
floor at the same grid (VERDICT r4 item 1): per-element accounting says
the VPU tail is small, so the suspects are per-grid-step overhead and
the pipeline bubbles across the cross-step scratch dependency —
both scale with the STEP COUNT, not the work.  Round 5 decouples:

  granule  = interleave chunk -> block = granule/128 rows per candidate
             id (the k-linear slab-rescore cost)
  tile     = groups * granule rows per grid step (the step count)

Sweeps (kernel-only + e2e walls, recall-checked vs a f64 oracle):
  A. step-count axis: granule 2048, tile 2048/4096/8192/16384
  B. block-size axis: granule 512/1024, tile 8192 (rescore 4x/2x cheaper)
  C. tq axis: best config at tq 256 vs 512
  D. k=100 through bcap with granule 512 (kb=108, 432-row rescore) vs
     the capped default.
  E. sustained (depth 6) at the best k=10 config.

Usage: python benchmarks/bcap_tune2.py [n] [dim] [q] [k]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 10_240
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    say(f"[tune2] devices={jax.devices()}")
    rng = np.random.default_rng(7)
    pts = rng.random((n, dim), dtype=np.float32) * 255.0
    qs = rng.random((q, dim), dtype=np.float32) * 255.0

    from petal_neighbors_tpu.ops.pallas.knn_kernel import (
        knn_pallas, prepare_bcap_planes, prepare_split)
    from petal_neighbors_tpu.ops import bruteforce as bf

    mu = np.asarray(bf.center_of(pts))
    qs_dev = jnp.asarray(qs)
    qs_c = jnp.asarray(qs - mu)

    # f64 oracle, 512 queries
    n_or = 512
    import torch
    q64 = torch.from_numpy(qs[:n_or]).double()
    part_d, part_i = [], []
    for s in range(0, n, 131072):
        p64 = torch.from_numpy(np.ascontiguousarray(pts[s:s + 131072])
                               ).double()
        d = (p64 * p64).sum(1)[None, :] - 2.0 * (q64 @ p64.T)
        dd, ii = torch.topk(d, k, dim=1, largest=False)
        part_d.append(dd)
        part_i.append(ii + s)
    cd = torch.cat(part_d, 1)
    ci = torch.cat(part_i, 1)
    _, take = torch.topk(cd, k, dim=1, largest=False)
    oracle = torch.gather(ci, 1, take).numpy()

    def recall(ids):
        ids = np.asarray(ids)[:n_or]
        hits = sum(len(set(a.tolist()) & set(b.tolist()))
                   for a, b in zip(ids, oracle))
        return hits / oracle.size

    tn_pad = bf.pad_granule(dim)
    ppad, pnorm = bf.pad_for_pallas(jnp.asarray(pts) - mu, tn=tn_pad)
    np.asarray(pnorm[:1])

    planes = {}
    for g in (512, 1024, 2048):
        planes[g] = prepare_bcap_planes(ppad, pnorm, tn=g, precision="high")
        np.asarray(planes[g][1][:1])
        say(f"  planes g={g} ready")

    def e2e(g, tile, tq=None, kk=k, passes=None):
        return bf.knn_pallas_prepadded(
            ppad, pnorm, qs_dev, kk, n, jnp.asarray(mu), precision="high",
            tq=tq, scheme="bcap", bcap_planes=planes[g], bcap_tn=g,
            bcap_tile=tile, capped_passes=passes)

    def kernel_only(g, tile, tq=256, kb=k + 8, passes=2):
        p_perm, xn_perm = planes[g]
        return knn_pallas(ppad, qs_c, xn_perm, k=kb, tq=tq, tn=tile,
                          precision="high", scheme="bcap", passes=passes,
                          granule=g, points_split=p_perm)

    say("--- A0: lane-min floor (passes=0: matmul + lane-min + seed) ---")
    for g, tile in ((2048, 2048), (2048, 8192), (512, 8192)):
        dt_f, _ = wall(functools.partial(kernel_only, g, tile, 256, k + 8,
                                         0))
        say(f"  g={g:5d} tile={tile:5d}: floor {q/dt_f/1e3:7.1f}k QPS")

    say("--- A/B: kernel-only + e2e sweep (k=%d) ---" % k)
    combos = [(2048, 2048, 256), (2048, 4096, 256), (2048, 8192, 256),
              (2048, 16384, 256), (1024, 8192, 256), (512, 4096, 256),
              (512, 8192, 256), (512, 2048, 256)]
    best = None
    for g, tile, tq in combos:
        try:
            dt_k, _ = wall(functools.partial(kernel_only, g, tile, tq))
            dt_e, out = wall(functools.partial(e2e, g, tile, tq))
        except Exception as exc:
            say(f"  g={g} tile={tile} tq={tq}: FAILED {type(exc).__name__}: "
                f"{exc}")
            continue
        rc = recall(out[1])
        say(f"  g={g:5d} tile={tile:5d} tq={tq}: kernel {q/dt_k/1e3:7.1f}k "
            f"e2e {q/dt_e/1e3:7.1f}k QPS  recall {rc:.4f}")
        if rc == 1.0 and (best is None or dt_e < best[0]):
            best = (dt_e, g, tile, tq)

    if best is not None:
        _, g, tile, _ = best
        for tq in (512,):
            try:
                dt_k, _ = wall(functools.partial(kernel_only, g, tile, tq))
                dt_e, out = wall(functools.partial(e2e, g, tile, tq))
                say(f"  g={g:5d} tile={tile:5d} tq={tq}: kernel "
                    f"{q/dt_k/1e3:7.1f}k e2e {q/dt_e/1e3:7.1f}k QPS  "
                    f"recall {recall(out[1]):.4f}")
            except Exception as exc:
                say(f"  tq={tq}: FAILED {exc}")
        dt_s = sustained(functools.partial(e2e, g, tile))
        say(f"  sustained (depth 6) at g={g} tile={tile}: "
            f"{q/dt_s/1e3:.1f}k QPS")

    say("--- D: k=100 routes ---")
    import torch as _t
    q64 = _t.from_numpy(qs[:256]).double()
    part_d, part_i = [], []
    for s in range(0, n, 131072):
        p64 = _t.from_numpy(np.ascontiguousarray(pts[s:s + 131072])).double()
        d = (p64 * p64).sum(1)[None, :] - 2.0 * (q64 @ p64.T)
        dd, ii = _t.topk(d, 100, dim=1, largest=False)
        part_d.append(dd)
        part_i.append(ii + s)
    cd = _t.cat(part_d, 1)
    ci = _t.cat(part_i, 1)
    _, take = _t.topk(cd, 100, dim=1, largest=False)
    oracle100 = _t.gather(ci, 1, take).numpy()

    def recall100(ids):
        ids = np.asarray(ids)[:256]
        hits = sum(len(set(a.tolist()) & set(b.tolist()))
                   for a, b in zip(ids, oracle100))
        return hits / oracle100.size

    for g, tile in ((512, 4096), (512, 8192), (1024, 8192), (2048, 8192)):
        try:
            dt_e, out = wall(functools.partial(e2e, g, tile, None, 100))
            say(f"  bcap k=100 g={g} tile={tile}: {q/dt_e/1e3:7.1f}k QPS  "
                f"recall {recall100(out[1]):.4f}")
        except Exception as exc:
            say(f"  bcap k=100 g={g} tile={tile}: FAILED "
                f"{type(exc).__name__}: {exc}")

    split = prepare_split(ppad)

    def capped100():
        return bf.knn_pallas_prepadded(
            ppad, pnorm, qs_dev, 100, n, jnp.asarray(mu), precision="high",
            pts_split=split, scheme="capped")

    dt_e, out = wall(capped100)
    say(f"  capped k=100 (r4 default): {q/dt_e/1e3:7.1f}k QPS  "
        f"recall {recall100(out[1]):.4f}")

    say("--- F: large-k bcap route (bisect + compact + narrow sort) ---")
    q2 = 2048
    qs2 = qs_dev[:q2]

    def oracle_dists(nq, kk):
        qq = _t.from_numpy(qs[:nq]).double()
        qn = (qq * qq).sum(1)[:, None]
        parts = []
        for s in range(0, n, 131072):
            p64 = _t.from_numpy(np.ascontiguousarray(pts[s:s + 131072])
                                ).double()
            d = qn + (p64 * p64).sum(1)[None, :] - 2.0 * (qq @ p64.T)
            dd, _ = _t.topk(d, kk, dim=1, largest=False)
            parts.append(dd)
        cd = _t.cat(parts, 1)
        dd, _ = _t.topk(cd, kk, dim=1, largest=False)
        return np.sqrt(np.maximum(dd.numpy(), 0.0))

    for kk, g, tile in ((256, 512, 2048), (512, 512, 4096),
                        (1000, 512, 4096), (1000, 512, 8192),
                        (2048, 512, 16384), (4080, 512, 16384)):
        try:
            fn = functools.partial(
                bf.knn_pallas_prepadded, ppad, pnorm, qs2, kk, n,
                jnp.asarray(mu), precision="high", scheme="bcap",
                bcap_planes=planes[g], bcap_tn=g, bcap_tile=tile)
            dt_e, out = wall(fn, reps=2)
            od = oracle_dists(32, kk)
            got = np.asarray(out[0])[:32]
            bad = int((np.abs(got - od) > 1e-3 * (1 + od)).sum())
            say(f"  bcap k={kk} g={g} tile={tile}: {q2/dt_e/1e3:6.2f}k QPS"
                f"  dist-mismatch {bad}/{od.size}")
        except Exception as exc:
            say(f"  bcap k={kk} g={g} tile={tile}: FAILED "
                f"{type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
