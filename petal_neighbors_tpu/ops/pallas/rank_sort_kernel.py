"""Pallas counting-rank row sort (key + int32 payload) for the large-k path.

Why: the bitonic network (`sort_kernel.py`) spends its time in cross-lane
``pltpu.roll``s — log2(S)·(log2(S)+1)/2 stages of multi-vreg lane
permutes — and measured ~225 ms at width ~1-2k over 2048 rows, identical
across three implementations (BENCH_NOTES "Capped scheme extended"):
lane-permute throughput, not data volume, is the wall.  This kernel
replaces permutes with pure elementwise work: every element's output
position is its COUNT of smaller elements (rank), computed as O(S²/row)
broadcast compares with the reduction on the SUBLANE axis (a lane-axis
reduce is a log-lane shuffle per element; the first cut reduced over
lanes and ran no faster than the bitonic), and placement is a one-hot
multiply-accumulate — both VPU-pipelined dense ops with zero cross-lane
shuffles and no data-dependent control flow.

Measured same-window on TPU v5e, 2048 rows (benchmarks/sort_probe.py):
O(S²) elementwise roughly matches the permute network at equal padded
width (1032: rank 626 ms vs bitonic 536), and wins where counting
rank's 128-multiple padding halves the width against the bitonic's
power-of-two pad — width 2056: 706 vs 1232 ms; 4096: 1686 vs 3088.
``ops.bruteforce._rescore_large`` routes widths > 2048 here.

Contract (same as ``bitonic_sort_pairs``): keys NaN-free (callers map
NaN -> +inf, ops.topk.nan_to_inf), rows sort ascending, payload follows
its key, ties break deterministically (by input position — a total
order, so ranks are a permutation and placement is collision-free).

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

__all__ = ["rank_sort_pairs"]

_STRIP = 128      # i-strip width (sublane granule of the 3D transients)
_JCHUNK = 1024    # j/r chunk bounding the (tq, 128, chunk) transients


def _rank_sort_kernel(kd_ref, kv_ref, out_d_ref, out_i_ref, rank_ref,
                      *, S: int):
    kd = kd_ref[:]
    ci = kv_ref[:]
    tq = kd.shape[0]
    T = S // _STRIP
    C = min(_JCHUNK, S)
    NC = S // C if S % C == 0 else -(-S // C)

    # ---- phase 1: rank[i] = #{j : key_j < key_i or (== and j < i)} ----
    # layout: i rides the LANE axis (full-S chunks), j the SUBLANE axis
    # (128-strips) — the reduction is then over sublanes, the cheap
    # direction on TPU (a lane-axis jnp.sum is a log-lane shuffle per
    # element and measured ~20x slower end-to-end; the first cut of this
    # kernel reduced over lanes and ran no faster than the bitonic).
    for c in range(NC):
        lo = c * C
        hi = min(S, lo + C)
        w = hi - lo
        me = jax.lax.slice_in_dim(kd, lo, hi, axis=1)     # (tq, w) = i
        me3 = me.reshape(tq, 1, w)
        ilane = jax.lax.broadcasted_iota(jnp.int32, (tq, _STRIP, w),
                                         2) + lo
        cnt = jnp.zeros((tq, w), jnp.int32)
        for t in range(T):
            other = jax.lax.slice_in_dim(
                kd, t * _STRIP, (t + 1) * _STRIP, axis=1)  # (tq, 128) = j
            o3 = other.reshape(tq, _STRIP, 1)
            jsub = jax.lax.broadcasted_iota(
                jnp.int32, (tq, _STRIP, w), 1) + t * _STRIP
            take = (o3 < me3) | ((o3 == me3) & (jsub < ilane))
            cnt += jnp.sum(take.astype(jnp.int32), axis=1)
        rank_ref[:, lo:hi] = cnt

    # ---- phase 2: out[rank[i]] = (key_i, val_i) via one-hot MAC ----
    rank = rank_ref[:]
    for c in range(NC):
        lo = c * C
        hi = min(S, lo + C)
        acc_d = jnp.zeros((tq, hi - lo), jnp.float32)
        acc_i = jnp.zeros((tq, hi - lo), jnp.int32)
        for t in range(T):
            sl = (t * _STRIP, (t + 1) * _STRIP)
            r3 = jax.lax.slice_in_dim(rank, *sl, axis=1) \
                .reshape(tq, _STRIP, 1)
            rpos = jax.lax.broadcasted_iota(
                jnp.int32, (tq, _STRIP, hi - lo), 2) + lo
            oh = (r3 == rpos)
            dsrc = jax.lax.slice_in_dim(kd, *sl, axis=1) \
                .reshape(tq, _STRIP, 1)
            isrc = jax.lax.slice_in_dim(ci, *sl, axis=1) \
                .reshape(tq, _STRIP, 1)
            acc_d += jnp.sum(jnp.where(oh, dsrc, 0.0), axis=1)
            acc_i += jnp.sum(jnp.where(oh, isrc, 0), axis=1)
        out_d_ref[:, lo:hi] = acc_d
        out_i_ref[:, lo:hi] = acc_i


@functools.partial(jax.jit, static_argnames=("tq", "interpret"))
def rank_sort_pairs(keys, vals, *, tq: int | None = None,
                    interpret: bool = False):
    """Row-sort ``keys`` ascending (f32, NaN-free) carrying int32
    ``vals``; pads the lane dimension to a multiple of 128 with
    (+inf, -1).  Returns arrays of the original shape.  Drop-in for
    ``bitonic_sort_pairs`` — preferred at width > 2048 where the
    bitonic's power-of-two pad doubles its work (see module docstring).

    ``tq`` (row tile) defaults by padded width: 16 up to S=2304 (~10%
    over tq=8 at width 2056, sort_probe), 8 beyond — at S=4096 the
    tq=16 body spills Mosaic's register allocator ~212 MB past the
    128 MB VMEM budget (compile OOM, /tmp/largek2.log r4); tq=8 at the
    same width compiles and measured 1686 ms vs the bitonic's 3088."""
    q, n = keys.shape
    assert vals.shape == keys.shape, (keys.shape, vals.shape)
    S = max(-(-n // 128) * 128, 128)
    if tq is None:
        tq = 16 if S <= 2304 else 8
    if S != n:
        keys = jnp.pad(keys, ((0, 0), (0, S - n)), constant_values=jnp.inf)
        vals = jnp.pad(vals, ((0, 0), (0, S - n)), constant_values=-1)
    if q < tq:
        tq = 8
    qpad = (-q) % tq
    if qpad:
        keys = jnp.pad(keys, ((0, qpad), (0, 0)), constant_values=jnp.inf)
        vals = jnp.pad(vals, ((0, qpad), (0, 0)), constant_values=-1)
    qp = keys.shape[0]
    kernel = functools.partial(_rank_sort_kernel, S=S)
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
        scratch_shapes=[pltpu.VMEM((tq, S), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(keys.astype(jnp.float32), vals.astype(jnp.int32))
    return out_d[:q, :n], out_i[:q, :n]
