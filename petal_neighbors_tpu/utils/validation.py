"""Input validation shared by every index constructor.

Replicates the construction-time contract of the reference
(ball_tree.rs:44-49, vantage_point_tree.rs:56-62):

* empty input          -> ``EmptyArrayError``
* non-row-contiguous   -> ``NotContiguousError`` (Fortran-order NumPy input)

plus the dtype policy of the TPU engine: float32 / float64 compute (float64
only where the backend supports it; integers are promoted to float32).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..errors import EmptyArrayError, NotContiguousError

__all__ = ["check_points", "check_points_host", "check_query", "INT_DTYPE"]

INT_DTYPE = jnp.int32

_FLOAT_DTYPES = (np.float32, np.float64)


def _f64_supported() -> bool:
    """f64 compute is kept only where the backend supports it natively:
    TPU f64 is emulated and pathologically slow (SURVEY.md §7 hard parts),
    so f64 inputs are downcast to f32 there (documented numeric contract;
    x64 must also be enabled for CPU f64)."""
    import jax
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return platform not in ("tpu", "axon") and jax.config.jax_enable_x64


def _as_float_dtype(dtype) -> np.dtype:
    dtype = np.dtype(dtype)
    if dtype == np.dtype(np.float64):
        return dtype if _f64_supported() else np.dtype(np.float32)
    if dtype == np.dtype(np.float32):
        return dtype
    return np.dtype(np.float32)


def _validate_np(points: np.ndarray) -> None:
    if points.ndim != 2:
        raise ValueError(f"points must be 2-D, got shape {points.shape}")
    if points.shape[0] == 0 or points.shape[1] == 0:
        raise EmptyArrayError()
    # Row-contiguity: each row must be contiguous in memory. A C-order
    # matrix always is; a Fortran-order matrix with >1 row is not
    # (mirrors ndarray's `is_standard_layout` on row 0).
    if points.shape[0] > 1 and points.shape[1] > 1:
        if points.strides[1] != points.itemsize:
            raise NotContiguousError()


def check_points(points) -> jnp.ndarray:
    """Validate and convert a (n, d) points matrix.

    Raises ``EmptyArrayError`` for zero rows/cols and ``NotContiguousError``
    for NumPy inputs whose rows are not contiguous (the reference's
    standard-layout check, ball_tree.rs:47-49).
    """
    if isinstance(points, np.ndarray):
        _validate_np(points)
        return jnp.asarray(points, dtype=_as_float_dtype(points.dtype))

    arr = jnp.asarray(points)
    if arr.ndim != 2:
        raise ValueError(f"points must be 2-D, got shape {arr.shape}")
    if arr.shape[0] == 0 or arr.shape[1] == 0:
        raise EmptyArrayError()
    return arr.astype(_as_float_dtype(arr.dtype))


def check_points_host(points):
    """``check_points`` that keeps NumPy input on the HOST (no device
    upload).  Used by indexes whose device-resident representation is
    derived (centered/padded copies): holding a redundant device copy of
    the original doubles HBM use on multi-GB corpora (GIST-1M at 960-d is
    3.8 GB — the r1 layout kept 4 full copies and OOMed a 16 GB chip).
    Already-on-device inputs are returned as is (no transfer back)."""
    if isinstance(points, np.ndarray):
        _validate_np(points)
        return np.ascontiguousarray(
            points.astype(_as_float_dtype(points.dtype), copy=False))
    return check_points(points)


def check_query(point, dim: int, dtype) -> jnp.ndarray:
    """Validate a single (d,) query vector against the index dimension."""
    q = jnp.asarray(point)
    if q.ndim != 1:
        raise ValueError(f"query point must be 1-D, got shape {q.shape}")
    if q.shape[0] != dim:
        raise ValueError(f"query dim {q.shape[0]} != index dim {dim}")
    return q.astype(dtype)


def check_query_batch(queries, dim: int, dtype) -> jnp.ndarray:
    """Validate a (q, d) batch of query vectors."""
    q = jnp.asarray(queries)
    if q.ndim != 2:
        raise ValueError(f"query batch must be 2-D, got shape {q.shape}")
    if q.shape[1] != dim:
        raise ValueError(f"query dim {q.shape[1]} != index dim {dim}")
    return q.astype(dtype)
