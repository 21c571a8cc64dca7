"""Benchmark suite: the reference's Criterion workloads + BASELINE configs.

Usage:
    python benchmarks/run.py criterion      # the 3 reference workloads
    python benchmarks/run.py config1..5     # BASELINE.md driver configs
    python benchmarks/run.py all

Each benchmark prints one JSON line.  The reference publishes no numbers
(BASELINE.md), so these record OUR numbers per workload; bench.py at the
repo root remains the single headline metric.

Reference workloads (benches/ball_tree.rs):
  build:        n=128, d=10, f64 uniform [0,1), BallTree::euclidean (:8-20)
  query:        n=64, d=10, 64 self-queries, k=5 (:43-62)
  query_radius: n=64, d=10, 64 self-queries, eps=0.2 (:22-41)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    return np.asarray(x)


def _time(fn, reps=5, warmup=1):
    for _ in range(warmup):
        out = fn()
        if out is not None:
            # sync the warmup too: first execution of a freshly compiled
            # kernel through the remote tunnel can take tens of seconds
            # and would otherwise bleed into the timed reps (async queue)
            _sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    if out is not None:
        _sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / reps


def _emit(name, seconds, **extra):
    print(json.dumps({"metric": name, "value": round(seconds * 1e6, 2),
                      "unit": "us", **extra}))


def bench_criterion():
    from petal_neighbors_tpu import BallTree

    rng = np.random.default_rng(0xB411)
    pts128 = rng.uniform(0, 1, (128, 10))
    _emit("criterion_build_n128_d10",
          _time(lambda: BallTree.euclidean(pts128)))

    pts64 = rng.uniform(0, 1, (64, 10))
    tree = BallTree.euclidean(pts64)
    _emit("criterion_query_64q_k5",
          _time(lambda: tree.query_batch(pts64, 5)), batched=True)
    _emit("criterion_query_radius_64q_eps0.2",
          _time(lambda: tree.query_radius_batch(pts64, 0.2)), batched=True)


def bench_config1():
    """100k synthetic 2-D Gaussian, BallTree euclidean, k=2."""
    from petal_neighbors_tpu import BallTree

    rng = np.random.default_rng(1)
    pts = rng.normal(size=(100_000, 2)).astype(np.float32)
    qs = rng.normal(size=(10_000, 2)).astype(np.float32)
    t0 = time.perf_counter()
    tree = BallTree.euclidean(pts)
    build_s = time.perf_counter() - t0
    dt = _time(lambda: tree.query_batch(qs, 2), reps=3)
    print(json.dumps({"metric": "config1_balltree_100k_2d_k2_qps",
                      "value": round(len(qs) / dt, 1), "unit": "qps",
                      "build_s": round(build_s, 3)}))


def bench_config2():
    """VP tree, low-dim, k=10, 1k-query batched lockstep traversal."""
    from petal_neighbors_tpu import VantagePointTree

    rng = np.random.default_rng(2)
    pts = rng.normal(size=(100_000, 2)).astype(np.float32)
    qs = rng.normal(size=(1_000, 2)).astype(np.float32)
    t0 = time.perf_counter()
    vp = VantagePointTree.euclidean(pts)
    build_s = time.perf_counter() - t0
    dt = _time(lambda: vp.query_batch(qs, 10), reps=3)
    print(json.dumps({"metric": "config2_vptree_100k_2d_k10_qps",
                      "value": round(len(qs) / dt, 1), "unit": "qps",
                      "build_s": round(build_s, 3)}))


def bench_config3():
    """SIFT-1M-shaped exact top-k via the MXU path (same as bench.py but
    also k=100)."""
    from petal_neighbors_tpu import BruteForce

    rng = np.random.default_rng(3)
    pts = rng.random((1_000_000, 128), dtype=np.float32) * 255
    qs = rng.random((10_000, 128), dtype=np.float32) * 255
    idx = BruteForce.euclidean(pts)
    for k in (10, 100):
        dt = _time(lambda: idx.query_batch(qs, k), reps=3)
        print(json.dumps({"metric": f"config3_sift1m_k{k}_qps",
                          "value": round(len(qs) / dt, 1), "unit": "qps"}))


def bench_config4():
    """query_radius epsilon sweep (DBSCAN driver) with masked outputs."""
    from petal_neighbors_tpu import BallTree

    rng = np.random.default_rng(4)
    pts = rng.normal(size=(100_000, 2)).astype(np.float32)
    qs = pts[:4096]
    tree = BallTree.euclidean(pts)
    for eps in (0.01, 0.05, 0.2):
        # masked-segment output (indices + counts), the DBSCAN driver shape
        dt = _time(lambda: tree.query_radius_batch(qs, eps, cap=512),
                   reps=3)
        print(json.dumps({"metric": f"config4_radius_eps{eps}_qps",
                          "value": round(len(qs) / dt, 1), "unit": "qps"}))


def bench_config5():
    """GIST-1M-shaped 960-d + cosine/minkowski generic-metric path."""
    from petal_neighbors_tpu import BruteForce, Cosine, Minkowski

    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    n = 1_000_000  # true GIST-1M shape: 960-d f32 = 3.8 GB (fits v5e HBM)
    pts = jnp.asarray(rng.random((n, 960), dtype=np.float32))
    # ONE upload shared by all three indexes: at ~30 MB/s tunnel
    # bandwidth each extra 3.8 GB host->device copy costs ~2 minutes
    qs = rng.random((1_000, 960), dtype=np.float32)
    for name, metric in (("euclidean", None), ("cosine", Cosine()),
                         ("minkowski3", Minkowski(3.0))):
        idx = BruteForce(pts, metric or "euclidean")
        dt = _time(lambda: idx.query_batch(qs, 10), reps=2)
        print(json.dumps({"metric": f"config5_gist960d_{name}_qps",
                          "value": round(len(qs) / dt, 1), "unit": "qps"}),
              flush=True)


BENCHES = {
    "criterion": bench_criterion,
    "config1": bench_config1,
    "config2": bench_config2,
    "config3": bench_config3,
    "config4": bench_config4,
    "config5": bench_config5,
}


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(BENCHES) if which == "all" else [which]
    for name in names:
        BENCHES[name]()
