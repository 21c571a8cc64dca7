"""Pallas bitonic row sort (key + int32 payload) for the large-k path.

Why: XLA's TopK/sort custom calls dominate large-k serving (the round-1
finding that motivated the fused kernel — BENCH_NOTES), and the
threshold-collect scheme needs one final "sort ~C candidates per query"
step with C in the thousands.  A row-parallel bitonic network runs on
the VPU as log2(S)·(log2(S)+1)/2 compare-exchange passes expressed as
lane rolls + selects (the same Mosaic-native building block as the merge
kernel's ``_bitonic_merge_sorted``), with no data-dependent control flow.

Contract: keys must be NaN-free (callers map NaN -> +inf per the
NaN-is-farthest policy, ops.topk.nan_to_inf); rows sort ascending; the
payload follows its key; ties keep an arbitrary but deterministic order.

Reference scope note: the reference returns fully sorted neighbor lists
(ball_tree.rs:117-120); this kernel is how the TPU engine affords that
contract at k in the thousands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bitonic_sort_pairs"]


def _next_pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()


def _sort_kernel(kd_ref, kv_ref, out_d_ref, out_i_ref, *, S: int):
    cd = kd_ref[:]
    ci = kv_ref[:]
    tq = cd.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, S), 1)
    size = 2
    while size <= S:
        # ascending blocks where (lane & size) == 0 — the standard
        # bitonic direction rule, giving a fully ascending row at the
        # final size == S merge
        asc = (lane & size) == 0
        s = size // 2
        while s >= 1:
            first = (lane % (2 * s)) < s
            up_d = pltpu.roll(cd, S - s, 1)      # partner from lane+s
            dn_d = pltpu.roll(cd, s, 1)          # partner from lane-s
            up_i = pltpu.roll(ci, S - s, 1)
            dn_i = pltpu.roll(ci, s, 1)
            part_d = jnp.where(first, up_d, dn_d)
            part_i = jnp.where(first, up_i, dn_i)
            # lower lane of an ascending pair keeps the min (and vice
            # versa); logical form, not where-of-bools (Mosaic i8 issue,
            # see _bitonic_merge_sorted)
            want_min = first == asc
            take = (want_min & (part_d < cd)) | (~want_min & (part_d > cd))
            cd = jnp.where(take, part_d, cd)
            ci = jnp.where(take, part_i, ci)
            s //= 2
        size *= 2
    out_d_ref[:] = cd
    out_i_ref[:] = ci


@functools.partial(jax.jit, static_argnames=("tq", "interpret"))
def bitonic_sort_pairs(keys, vals, *, tq: int = 16,
                       interpret: bool = False):
    """Row-sort ``keys`` ascending (f32, NaN-free) carrying int32
    ``vals``; pads the lane dimension to a power of two with
    (+inf, -1).  Returns arrays of the original shape."""
    q, n = keys.shape
    assert vals.shape == keys.shape, (keys.shape, vals.shape)
    S = max(_next_pow2(n), 128)
    if S != n:
        keys = jnp.pad(keys, ((0, 0), (0, S - n)),
                       constant_values=jnp.inf)
        vals = jnp.pad(vals, ((0, 0), (0, S - n)), constant_values=-1)
    if q < tq:
        tq = max(8, _next_pow2(q) if q > 8 else 8)
    qpad = (-q) % tq
    if qpad:
        keys = jnp.pad(keys, ((0, qpad), (0, 0)),
                       constant_values=jnp.inf)
        vals = jnp.pad(vals, ((0, qpad), (0, 0)), constant_values=-1)
    qp = keys.shape[0]
    kernel = functools.partial(_sort_kernel, S=S)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(qp // tq,),
        in_specs=[
            pl.BlockSpec((tq, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, S), jnp.float32),
            jax.ShapeDtypeStruct((qp, S), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(keys.astype(jnp.float32), vals.astype(jnp.int32))
    return out_d[:q, :n], out_i[:q, :n]
