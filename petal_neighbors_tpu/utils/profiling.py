"""Profiling / tracing helpers (SURVEY.md §5 tracing row).

The reference's only instrumentation is Criterion wall time; here the
equivalents are the benchmark harness (benchmarks/run.py), per-query
traversal stats (``query_batch(with_stats=True)``), and these thin
wrappers over ``jax.profiler`` for kernel-level traces viewable in
TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["trace", "wall_time"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace of the enclosed block.

    >>> with trace("/tmp/knn-trace"):
    ...     index.query_batch(queries, 10)
    View with: tensorboard --logdir /tmp/knn-trace  (or xprof/Perfetto).
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_time(out: dict, key: str = "seconds"):
    """Tunnel-safe wall timing: synchronizes by host-fetching the block's
    result if the caller stores it in ``out['result']`` (remote devices
    do not honor block_until_ready — see CLAUDE.md)."""
    t0 = time.perf_counter()
    try:
        yield out
    finally:
        if "result" in out:
            import jax
            leaves = jax.tree.leaves(out["result"])
            if leaves:
                np.asarray(leaves[0])
        out[key] = time.perf_counter() - t0
