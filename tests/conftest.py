"""Test configuration: run on a virtual 8-device CPU mesh with x64.

This is the JAX "fake backend" idiom standing in for a TPU pod
(SURVEY.md §4): multi-chip sharding tests run against
``--xla_force_host_platform_device_count=8`` on CPU, and float64 is
enabled so the reference's f64 test fixtures can be replicated exactly.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax is preloaded in this image with jax_platforms already forced to the
# TPU ("axon") platform, so the env var alone is ignored — override the
# config directly before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def count_device_programs():
    """Count distinct device-program executions of a callable.

    ``jax.clear_caches()`` first, so every program (eager op or jitted
    function) misses the C++ fastpath and flows through
    ``ExecuteReplicated.__call__`` exactly once — i.e. the count is the
    number of DISTINCT device programs the call dispatches.  This is the
    dispatch-count gate for the one-program-per-public-call invariant
    (CLAUDE.md: each dispatch is a tunnel RTT on the real device)."""
    import contextlib

    import jax._src.interpreters.pxla as pxla

    def run(fn):
        jax.clear_caches()
        state = {"n": 0}
        orig = pxla.ExecuteReplicated.__call__

        def patched(self, *a, **k):
            state["n"] += 1
            return orig(self, *a, **k)

        with contextlib.ExitStack() as stack:
            pxla.ExecuteReplicated.__call__ = patched
            stack.callback(
                lambda: setattr(pxla.ExecuteReplicated, "__call__", orig))
            result = fn()
        return state["n"], result

    return run
