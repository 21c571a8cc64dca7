"""Fused exact k-NN Pallas kernel: distance tile + running top-k in VMEM.

Why: the XLA path materializes every (Q, chunk) score tile in HBM and runs
a TopK custom-call over it — measured ~2/3 of query time is TopK + score
traffic.  Here the score tile lives only in VMEM and the running top-k is
updated in-register, so the kernel stays MXU/HBM-streaming-bound like a
plain matmul over the points.

Scheme (grid (qi, nj), nj fastest: the points stream while a query tile
stays resident; TPU grids execute sequentially so VMEM scratch carries the
running state across nj):

  1. ``s = q_tile @ p_chunk.T`` on the MXU; reduced distance via the
     index-resident norms.
  2. One VPU pass compares the tile against the running k-th-best
     threshold (``tau``): after the first few chunks almost every tile has
     no survivor and the merge is skipped entirely.
  3. On a hit: extract the tile's k smallest by k (min, argmin, mask)
     passes, then fold each into the *unsorted* running working set by
     replacing the current maximum.  The working set is sorted once, at
     the last chunk.

Exact: the working set always holds the true k smallest seen so far; NaN
distances map to +inf (OrderedFloat NaN-is-farthest policy,
CHANGELOG.md:111-115).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["knn_pallas", "pallas_available"]


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _knn_kernel(qn_ref, xn_ref, q_ref, p_ref, out_d_ref, out_i_ref,
                best_d, best_i, *, k: int, tn: int, n_real: int,
                n_chunks: int, fast: bool = False):
    """Small-k variant: each while-iteration re-scans the full tile for
    its minimum (4 full-tile VPU passes per extracted candidate)."""
    nj = pl.program_id(1)
    tq = best_d.shape[0]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1)

    @pl.when(nj == 0)
    def _():
        best_d[:] = jnp.full((tq, k), jnp.inf, dtype=jnp.float32)
        best_i[:] = jnp.full((tq, k), -1, dtype=jnp.int32)

    # fast=True: one bf16 MXU pass (callers pair it with an error-bound
    # verification + precise fallback); fast=False: full-f32 passes
    prec = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    s = jnp.dot(q_ref[:], p_ref[:].T, preferred_element_type=jnp.float32,
                precision=prec)
    rd = qn_ref[:].T + xn_ref[:] - 2.0 * s
    rd = jnp.maximum(rd, 0.0)

    col = jax.lax.broadcasted_iota(jnp.int32, rd.shape, 1)
    gid = nj * tn + col
    valid = (gid < n_real) & ~jnp.isnan(rd)
    rd = jnp.where(valid, rd, jnp.inf)

    # Data-dependent merge: extract tile minima only while some query
    # still improves.  A candidate >= the current k-th best can never
    # enter the result later (tau only shrinks), so masking each
    # extracted column is safe; the loop therefore runs exactly
    # (#improving candidates) iterations — a handful on early chunks,
    # zero on almost all later ones.
    def _cond(state):
        r, bd, _ = state
        tau = jnp.max(bd, axis=1)
        return jnp.any(r < tau[:, None])

    def _body(state):
        r, bd, bi = state
        m = jnp.min(r, axis=1)
        am = jnp.argmin(r, axis=1).astype(jnp.int32)
        r = jnp.where(col == am[:, None], jnp.inf, r)
        # fold into the working set by replacing the per-query max
        cur_max = jnp.max(bd, axis=1)
        amax = jnp.argmax(bd, axis=1).astype(jnp.int32)
        take = m < cur_max
        sel = (kcol == amax[:, None]) & take[:, None]
        bd = jnp.where(sel, m[:, None], bd)
        bi = jnp.where(sel, (nj * tn + am)[:, None], bi)
        return r, bd, bi

    _, bd, bi = jax.lax.while_loop(_cond, _body,
                                   (rd, best_d[:], best_i[:]))
    best_d[:] = bd
    best_i[:] = bi

    @pl.when(nj == n_chunks - 1)
    def _():
        od, oi = _sort_working_set(best_d[:], best_i[:], k)
        out_d_ref[:] = od
        out_i_ref[:] = oi


def _sort_working_set(bd, bi, k: int):
    """Sort the (TQ, k) unsorted working set ascending by k passes of
    min-extraction (runs once per query tile, at the last chunk)."""
    tq = bd.shape[0]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1)
    od = jnp.zeros((tq, k), dtype=bd.dtype)
    oi = jnp.zeros((tq, k), dtype=jnp.int32)
    for j in range(k):
        m = jnp.min(bd, axis=1)
        am = jnp.argmin(bd, axis=1).astype(jnp.int32)
        idx_at = jnp.sum(jnp.where(kcol == am[:, None], bi, 0), axis=1)
        od = jnp.where(kcol == j, m[:, None], od)
        oi = jnp.where(kcol == j, idx_at[:, None], oi)
        bd = jnp.where(kcol == am[:, None], jnp.inf, bd)
    return od, oi


SUBTILE = 128


def _knn_kernel_grouped(qn_ref, xn_ref, q_ref, p_ref, out_d_ref, out_i_ref,
                        best_d, best_i, *, k: int, tn: int, n_real: int,
                        n_chunks: int, fast: bool = False):
    """Large-k variant: sub-tiled extraction.

    The (TQ, TN) distance tile is processed as TN/128 column sub-tiles,
    each with its own threshold check + extraction while-loop over only
    (TQ, 128) lanes.  Per extracted candidate the cost drops from a
    full-tile pass to a 128-lane pass (TN/128 x cheaper), which keeps
    per-query extraction counts of ~k*ln(chunks) affordable at k ~ 100.
    (Mosaic lowers no dynamic row-gather, so the group-cache scheme is
    expressed as static sub-tile slices instead.)
    """
    nj = pl.program_id(1)
    tq = best_d.shape[0]
    G = tn // SUBTILE
    kcol = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1)
    csub = jax.lax.broadcasted_iota(jnp.int32, (tq, SUBTILE), 1)

    @pl.when(nj == 0)
    def _():
        best_d[:] = jnp.full((tq, k), jnp.inf, dtype=jnp.float32)
        best_i[:] = jnp.full((tq, k), -1, dtype=jnp.int32)

    prec = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    s = jnp.dot(q_ref[:], p_ref[:].T, preferred_element_type=jnp.float32,
                precision=prec)
    rd = qn_ref[:].T + xn_ref[:] - 2.0 * s
    rd = jnp.maximum(rd, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, rd.shape, 1)
    gid = nj * tn + col
    valid = (gid < n_real) & ~jnp.isnan(rd)
    rd = jnp.where(valid, rd, jnp.inf)

    bd = best_d[:]
    bi = best_i[:]
    for g in range(G):
        sub = rd[:, g * SUBTILE:(g + 1) * SUBTILE]       # static slice
        base = nj * tn + g * SUBTILE

        def _cond(state, _sub=sub):
            r, bd, _ = state
            tau = jnp.max(bd, axis=1)
            return jnp.any(r < tau[:, None])

        def _body(state, _base=base):
            r, bd, bi = state
            m = jnp.min(r, axis=1)
            am = jnp.argmin(r, axis=1).astype(jnp.int32)
            r = jnp.where(csub == am[:, None], jnp.inf, r)
            cur_max = jnp.max(bd, axis=1)
            amax = jnp.argmax(bd, axis=1).astype(jnp.int32)
            take = m < cur_max
            sel = (kcol == amax[:, None]) & take[:, None]
            bd = jnp.where(sel, m[:, None], bd)
            bi = jnp.where(sel, (_base + am)[:, None], bi)
            return r, bd, bi

        _, bd, bi = jax.lax.while_loop(_cond, _body, (sub, bd, bi))

    best_d[:] = bd
    best_i[:] = bi

    @pl.when(nj == n_chunks - 1)
    def _():
        od, oi = _sort_working_set(best_d[:], best_i[:], k)
        out_d_ref[:] = od
        out_i_ref[:] = oi


@functools.partial(jax.jit, static_argnames=("k", "tq", "tn", "interpret",
                                             "grouped", "fast"))
def knn_pallas(points, queries, point_norms, *, k: int,
               tq: int = 256, tn: int = 2048, interpret: bool = False,
               grouped: bool | None = None, fast: bool = False):
    """Exact k-NN via the fused Pallas kernel (squared-Euclidean).

    Caller contract: N % tn == 0, Q % tq == 0 (pad with NaN rows — they
    can never be selected), f32 inputs, k <= 256 (callers cap the scan
    width at ``k + RESCORE_SLACK <= 256``, see ``_pallas_eligible``).

    Returns (rdist (Q, k) ascending, indices (Q, k)); indices of padded
    rows never appear; rdist domain (convert at the boundary).
    """
    n, d = points.shape
    q = queries.shape[0]
    assert n % tn == 0 and q % tq == 0, (n, tn, q, tq)
    assert 1 <= k <= 256, k
    n_chunks = n // tn
    qn = jnp.sum(queries * queries, axis=-1)[None, :]     # (1, Q)
    xn = point_norms[None, :]                              # (1, N)

    if grouped is None:
        grouped = k > 16
    body = _knn_kernel_grouped if grouped else _knn_kernel
    kernel = functools.partial(body, k=k, tn=tn, n_real=n,
                               n_chunks=n_chunks, fast=fast)

    grid = (q // tq, n_chunks)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq), lambda qi, nj: (0, qi),
                         memory_space=pltpu.VMEM),          # qn
            pl.BlockSpec((1, tn), lambda qi, nj: (0, nj),
                         memory_space=pltpu.VMEM),          # xn
            pl.BlockSpec((tq, d), lambda qi, nj: (qi, 0),
                         memory_space=pltpu.VMEM),          # queries
            pl.BlockSpec((tn, d), lambda qi, nj: (nj, 0),
                         memory_space=pltpu.VMEM),          # points
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda qi, nj: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda qi, nj: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, k), jnp.float32),
            jax.ShapeDtypeStruct((q, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, k), jnp.float32),
            pltpu.VMEM((tq, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # default scoped-vmem cap is 16 MiB; the working set at
            # tn=2048 with k ~ 40 needs ~18 MiB (v5e has far more VMEM)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * d,
            bytes_accessed=n * d * 4 + q * d * 4 + q * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qn, xn, queries, points)
    return out_d, out_i
