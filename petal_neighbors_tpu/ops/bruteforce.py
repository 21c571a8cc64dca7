"""Exact brute-force k-NN / radius search — the L0 end-to-end slice.

This is the TPU-native collapse of the reference's per-pair scalar loops
(distance.rs:26-35, ball_tree.rs:873-894 oracle): all distance evaluation
becomes a tiled ``‖q‖² + ‖x‖² − 2 q·xᵀ`` MXU matmul, streamed over point
chunks with a running top-k so the full (Q, N) distance matrix never
materializes in HBM (SIFT-1M x 10k queries would be 40 GB).

It is simultaneously:
* the exact-search fast path for high-dim workloads (BASELINE config #3),
* the oracle every tree index is tested against (recall@k == 1.0).
"""

from __future__ import annotations

import math
import warnings
from functools import partial

import jax
import jax.numpy as jnp

from ..distance import DIRECT_DIM_MAX, Euclidean, Metric
from .topk import (merge_topk, monotone_distances, nan_to_inf,
                   rescore_exact)

__all__ = ["knn", "radius_mask", "radius_counts", "compact_mask",
           "center_of", "radius_capped", "radius_counts_streaming",
           "distances_at"]


def center_of(points) -> jnp.ndarray:
    """Dataset mean for centering (NaN rows ignored; all-NaN columns -> 0).

    Euclidean distances are translation-invariant, but the
    ||q||^2+||x||^2-2qx matmul form is not *numerically*: its absolute
    error scales with eps*(|q|^2+|x|^2), so un-centered data (e.g. a
    feature matrix with mean 100) silently destroys the candidate set
    (measured recall@10 = 0.02).  Centering once at index build shrinks
    the norms to data-variance scale and restores exactness."""
    mu = jnp.nanmean(jnp.asarray(points), axis=0)
    return jnp.nan_to_num(mu)


def _pick_chunk(n: int, q: int, dim: int, chunk: int | None,
                *, direct: bool | None = None) -> int:
    if chunk is not None:
        return max(1, min(chunk, n))
    # Aim for ~64 MB of per-step intermediate (f32), power-of-two sized.
    # The direct-difference path materializes (q, c, dim), not just the
    # (q, c) tile — account for it or chunks blow out HBM.
    if direct is None:
        direct = dim <= DIRECT_DIM_MAX
    per_elem = 4 * (dim if direct else 1)
    target = max(1, (64 << 20) // max(per_elem * q, 1))
    c = 1 << min(int(math.log2(target)) if target > 1 else 0, 20)
    return max(128, min(c, n))


RESCORE_SLACK = 8

#: test hook: run Pallas kernels in interpret mode (CPU) so the kernel
#: integration paths are exercisable off-TPU (tests/conftest fixtures)
FORCE_INTERPRET = False


@partial(jax.jit, static_argnames=("tn", "with_split", "with_bcap"))
def prepare_euclidean_index(points, tn: int, with_split: bool = True,
                            with_bcap: bool = False):
    """One jitted program computing every index-resident artifact for the
    high-dim Euclidean path: center, kernel-padded centered points +
    norms, the NaN-row mask, and (optionally) the bf16 hi/lo split
    planes.  Fused so index build is ONE device dispatch (each eager op
    costs a tunnel RTT; the unfused sequence measured 19.5 s vs 5.5 s at
    SIFT-1M).

    Only DERIVED arrays are kept resident — no separate centered copy
    (callers slice ``ppad[:n]`` when the XLA path needs it) and the
    original stays on host: at GIST-1M scale (3.8 GB f32) each avoided
    copy is a quarter of the chip's HBM.  ``with_split=False`` skips the
    bf16 planes (another 1x f32 copy) — callers disable it when n*d
    exceeds a budget and query at "highest" precision instead.
    """
    from .pallas.knn_kernel import prepare_bcap_planes, prepare_split

    mu = center_of(points)
    qpts = points - mu
    bad = jnp.any(jnp.isnan(points), axis=-1)
    # pass `bad` down: NaN positions are identical in the centered copy
    # (mu is finite), and the full-corpus isnan sweep is an HBM pass
    ppad, pnorm = pad_for_pallas(qpts, tn=tn, bad=bad)
    split = prepare_split(ppad) if with_split else None
    # block-interleaved planes for the bcap serving scheme (round 4):
    # one more index-resident corpus copy, gated by the same HBM budget
    # logic as the split planes (callers set with_bcap)
    planes = (prepare_bcap_planes(ppad, pnorm,
                                  precision="high" if with_split
                                  else "highest")
              if with_bcap else None)
    return mu, ppad, pnorm, split, bad, planes

@partial(jax.jit, static_argnames=("tn", "with_split"))
def prepare_cosine_index(points, tn: int, with_split: bool = True):
    """Index-resident artifacts for serving COSINE through the Euclidean
    kernel: on L2-normalized rows, ``1 − q̂·x̂ = ‖q̂ − x̂‖²/2`` exactly, so
    the whole fused-kernel machinery (candidate pass, proof, direct-form
    rescore) applies with a final ``rd/2`` conversion.

    Zero-norm rows normalize to NaN (0/0) — the same NaN-row policy as
    the reference's division (distance.rs:93-105): zeroed in the padded
    copy with +inf norms, never selected.  No centering (unit vectors
    are already data-scale ~1, the matmul form's error is ~eps).
    """
    from .pallas.knn_kernel import prepare_split

    norms = jnp.sqrt(jnp.sum(points * points, axis=-1, keepdims=True))
    unit = points / norms
    bad = jnp.any(jnp.isnan(unit), axis=-1)
    ppad, pnorm = pad_for_pallas(unit, tn=tn, bad=bad)
    split = prepare_split(ppad) if with_split else None
    return ppad, pnorm, split, bad


_fallback_warned = False


def warn_pallas_fallback(exc: Exception) -> None:
    """Surface a Pallas→XLA fallback instead of silently eating it.

    The XLA scan path is exact but ~5x slower on SIFT-scale workloads; a
    TPU compile regression must show up as a warning, not a mysterious
    QPS drop.  Warned once per process (the exception repeats per call).
    """
    global _fallback_warned
    if not _fallback_warned:
        _fallback_warned = True
        warnings.warn(
            "fused Pallas k-NN kernel failed "
            f"({type(exc).__name__}: {exc}); serving from the ~5x slower "
            "XLA path for the rest of this process",
            RuntimeWarning, stacklevel=3)


def knn(points, queries, k: int, metric: Metric | None = None,
        *, chunk: int | None = None, point_norms=None,
        rescore: bool = True, backend: str = "auto",
        assume_centered: bool = False, invalid=None):
    """Public wrapper: resolves defaults, then dispatches to one jitted
    computation (a single device round-trip — essential when the device
    sits behind a network tunnel).

    ``backend``: "auto" uses the fused Pallas kernel on TPU for f32
    high-dim Euclidean (measured ~5x the XLA scan path on SIFT-1M); "xla"
    forces the portable path; "pallas" forces the kernel.

    ``assume_centered``: set by index classes that pre-center their data
    (see ``center_of``); otherwise high-dim Euclidean inputs are centered
    internally before the matmul path.
    """
    metric = metric or Euclidean()
    points = jnp.asarray(points)
    queries = jnp.asarray(queries)
    n = points.shape[0]
    k_eff = min(int(k), n)
    if k_eff == 0:
        return (jnp.zeros((queries.shape[0], 0), dtype=points.dtype),
                jnp.zeros((queries.shape[0], 0), dtype=jnp.int32))
    needs_center = (not assume_centered and isinstance(metric, Euclidean)
                    and points.shape[1] > DIRECT_DIM_MAX)
    if needs_center:
        mu = center_of(points)
        points = points - mu
        queries = queries - mu
        point_norms = None          # norms of the uncentered data are wrong
    # `invalid` (rows that must never match, e.g. an index's zeroed NaN
    # rows) is honored by the XLA path; it forces that path since
    # pad_for_pallas derives NaN rows from values alone
    if (backend != "xla" and invalid is None
            and _pallas_eligible(points, queries, k_eff, metric,
                                 force=(backend == "pallas"))):
        try:
            pp, pn = pad_for_pallas(points, point_norms)
            # "highest" here: the default "high" pass needs bf16 hi/lo
            # split planes, and deriving them per CALL is a full-corpus
            # HBM rewrite — only index classes that persist the planes
            # (prepare_*_index) should use reduced-precision passes
            return knn_pallas_prepadded(pp, pn, queries, k_eff, n,
                                        precision="highest")
        except Exception as exc:
            if backend == "pallas":
                raise
            # remote-compile hiccups etc.: fall through to the XLA path
            warn_pallas_fallback(exc)
    c = _pick_chunk(n, queries.shape[0], points.shape[1], chunk)
    if point_norms is None:
        return _knn_jit(points, queries, invalid, k=k_eff, metric=metric,
                        chunk=c, rescore=rescore)
    return _knn_jit_norms(points, queries, point_norms, invalid, k=k_eff,
                          metric=metric, chunk=c, rescore=rescore)


def _pallas_eligible(points, queries, k_eff, metric, force=False):
    from .pallas.knn_kernel import pallas_available
    # exact-type check: knn_pallas_prepadded converts rdist -> distance
    # with a hardcoded sqrt, which is wrong for subclasses that redefine
    # the conversion (SqEuclidean reports in the squared domain)
    hard = (type(metric) is Euclidean
            and points.dtype == jnp.float32
            and queries.dtype == jnp.float32
            and k_eff <= PALLAS_K_MAX)
    if force:
        if not hard:
            raise ValueError(
                "backend='pallas' requires Euclidean metric, f32 data and "
                f"k <= {PALLAS_K_MAX}")
        return True
    return (hard
            and points.shape[1] > DIRECT_DIM_MAX
            and points.shape[0] >= 4096
            and pallas_available())


def pallas_tile_n(dim: int) -> int:
    """Point-chunk tile length: shrinks at very high dim to fit VMEM.
    4096 measured best at SIFT dims (44.8k QPS vs 42.8k at 2048 on the
    1M x 128 headline, HIGHEST; same ordering at high/bf16).  At 960-d
    (GIST shape) 2048 beats the old 512 by 16% (8.9k vs 7.7k QPS
    kernel-only, r3 sweep) and still fits VMEM with bf16 split planes
    (~31 MB double-buffered point tiles at d=960)."""
    return 4096 if dim <= 256 else 2048


def pad_granule(dim: int) -> int:
    """Index pad length: a multiple of every kernel tile that may scan
    the padded copy — the tn=4096 fold/merge tiles AND the tn=16384
    subchunk-minima tile of the two-phase path (d <= 256 only)."""
    return 16384 if dim <= 256 else 2048


def pad_for_pallas(points, point_norms=None, *, tn: int | None = None,
                   bad=None):
    """Sanitize + pad points (+norms) for the fused kernel, ONCE at index
    build — per-query-call padding of a large corpus costs an extra HBM
    copy of the whole index (measured ~2x on SIFT-1M).

    NaN policy is enforced here so the kernel runs zero per-tile masking
    passes: rows containing any NaN are zeroed and their norms pinned to
    +inf, making their u-domain scores +inf (never selected — the
    NaN-is-farthest contract); padding rows get the same treatment.
    """
    n, dim = points.shape
    if tn is None:
        tn = pad_granule(dim)
    if bad is None:
        bad = jnp.any(jnp.isnan(points), axis=-1)
    points = jnp.where(bad[:, None], 0.0, points)
    if point_norms is None:
        point_norms = jnp.sum(points * points, axis=-1)
    point_norms = jnp.where(bad, jnp.inf, point_norms)
    npad = (-n) % tn
    if npad:
        points = jnp.pad(points, ((0, npad), (0, 0)))
        point_norms = jnp.pad(point_norms, (0, npad),
                              constant_values=jnp.inf)
    return points, point_norms


# Pointwise |approx_rd − true_rd| <= 4·eps·(‖q‖² + max‖x‖²) for the
# reduced-precision score matmuls (cross-term rounding; the 4x is safety
# margin over the analytic bound):
#  * "bf16": one bf16 pass, eps = 2^-8 mantissa rounding;
#  * "high": bf16x3 — the dropped lo·lo cross terms sum to
#    <= 2^-16·‖q‖‖x‖ (Cauchy-Schwarz) plus f32 accumulation rounding.
PROOF_EPS = {"bf16": 2.0 ** -8, "high": 2.0 ** -15, "highest": 2.0 ** -23}


def _proof_err(precision: str, dim: int, qn, xn_max):
    """Pointwise |approx_rd − true_rd| bound for a given score-matmul
    precision (see PROOF_EPS): cross-term rounding plus the worst-case
    sequential-sum accumulation term."""
    return (4.0 * PROOF_EPS[precision] + dim * 2.0 ** -24) * (qn + xn_max)


def _two_phase_small_k(pts_padded, xn_padded, queries_c,
                       k_eff: int, precision: str, pts_split, tn: int,
                       interpret: bool):
    """Two-phase small-k candidate generation (round-3 headline redesign).

    The fold kernel's per-tile while_loop breaks Mosaic's cross-step
    pipelining: the control-flow-free floor probe ran 2.7x faster at the
    same shape (BENCH_NOTES round 3).  So: phase A streams the corpus
    through ``subchunk_minima`` (matmul + segmented min, zero control
    flow); phase B takes each query's ``k`` smallest subchunk minima —
    their blocks provably contain every true top-k member: the k-th
    smallest subchunk min ``T`` upper-bounds the true k-th distance
    (k distinct blocks each contribute a point ≤ T), and any point with
    approx score ≤ T lives in a block whose min ≤ T — gathers those
    k·128 candidate rows, and re-scores them with the exact direct form.
    A per-batch proof (same PROOF_EPS machinery) guards the approx
    threshold; on failure the caller re-runs the fold kernel at
    "highest".

    Returns (best_rd (Q, k) ascending exact-direct, best_i, T (Q,)
    u-domain threshold).  NaN-query rows yield (-1, +inf).
    """
    from .pallas.knn_kernel import SUBCHUNK, subchunk_minima

    n_pad, dim = pts_padded.shape
    q = queries_c.shape[0]
    tq2 = 256 if q >= 256 else -(-q // 8) * 8
    qp2 = (-q) % tq2
    qs2 = (jnp.pad(queries_c, ((0, qp2), (0, 0)),
                   constant_values=jnp.nan) if qp2 else queries_c)
    # minima tile: 16384 keeps the (tq, nc=128) out block legal; small
    # corpora use one whole-array chunk (block == array dims is legal)
    if n_pad % 16384 == 0:
        tn_m = 16384
    elif n_pad <= 32768:
        tn_m = n_pad
    else:
        raise ValueError(
            f"two_phase needs a 16384-padded index (pad_granule), got "
            f"n_pad={n_pad}")
    minima = subchunk_minima(pts_padded, qs2, xn_padded, tq=tq2,
                             tn=tn_m, precision=precision,
                             points_split=pts_split,
                             interpret=interpret)[:q]
    nc = minima.shape[1]
    colnc = jnp.arange(nc, dtype=jnp.int32)
    m = minima
    sids = []
    v = None
    for _ in range(k_eff):
        v = jnp.min(m, axis=1)
        a = jnp.argmin(m, axis=1).astype(jnp.int32)
        sids.append(a)
        m = jnp.where(colnc[None, :] == a[:, None], jnp.inf, m)
    T = v                                                   # (q,) u-domain
    sid = jnp.stack(sids, axis=1)                           # (q, k)
    rows = (sid[:, :, None] * SUBCHUNK
            + jnp.arange(SUBCHUNK, dtype=jnp.int32)[None, None, :]
            ).reshape(q, k_eff * SUBCHUNK)

    # exact direct-form rescore of the candidate rows, streamed over
    # query blocks so the (qb, R, d) gather stays ~tens of MB
    R = k_eff * SUBCHUNK
    qb = max(8, min(512, (48 << 20) // max(R * dim * 4, 1) // 8 * 8))
    nb = -(-q // qb)
    qpad = nb * qb - q
    rows_b = jnp.pad(rows, ((0, qpad), (0, 0))).reshape(nb, qb, R)
    qs_b = jnp.pad(queries_c, ((0, qpad), (0, 0))).reshape(nb, qb, dim)

    from .topk import smallest_k

    def body(_, xs):
        rb, qsb = xs
        cand = pts_padded[rb]                               # (qb, R, d)
        rd = jnp.sum((qsb[:, None, :] - cand) ** 2, axis=-1)
        # zeroed NaN rows / padding carry +inf norms — the exclusion
        # that the direct form (unlike the u-domain) cannot see
        rd = jnp.where(jnp.isfinite(xn_padded[rb]), nan_to_inf(rd),
                       jnp.inf)
        return None, smallest_k(rd, rb, k_eff)

    _, (bd, bi) = jax.lax.scan(body, None, (rows_b, qs_b))
    best_rd = bd.reshape(nb * qb, k_eff)[:q]
    best_i = bi.reshape(nb * qb, k_eff)[:q]
    # NaN queries: candidates are garbage rows at inf distance — mask to
    # the kernel paths' (+inf, -1) policy (real-inf results cannot occur
    # here: two-phase routes only at n >> k)
    best_i = jnp.where(jnp.isfinite(best_rd), best_i, -1)
    return best_rd, best_i, T


def _bcap_rescore(pts_padded, xn_padded, queries, block_ids, k_eff: int,
                  block: int):
    """Exact direct-form rescore of the block-capped kernel's candidate
    BLOCKS: each id maps to ``block`` CONTIGUOUS corpus rows, so the
    gather moves (kb, block, d) slabs — large contiguous elements, not
    the scattered single-row gather that walled the round-3 two-phase
    path at 41k QPS-equivalent.  Streamed over query chunks to bound
    the (qc, kb, block, d) transient.  Returns (rd, idx) ascending,
    (Q, k_eff); padding/NaN corpus rows carry +inf norms and are
    excluded; NaN queries yield (+inf, -1)."""
    from .topk import smallest_k

    q, kb = block_ids.shape
    n_pad, dim = pts_padded.shape
    pts3 = pts_padded.reshape(n_pad // block, block, dim)
    xn3 = xn_padded.reshape(n_pad // block, block)
    R = kb * block
    qb = max(8, min(512, (192 << 20) // max(R * dim * 4, 1) // 8 * 8))
    nbq = -(-q // qb)
    qpad = nbq * qb - q
    bi_b = jnp.pad(block_ids, ((0, qpad), (0, 0))).reshape(nbq, qb, kb)
    qs_b = jnp.pad(queries, ((0, qpad), (0, 0))).reshape(nbq, qb, dim)
    off = jnp.arange(block, dtype=jnp.int32)

    def body(_, xs):
        bic, qsc = xs
        safe = jnp.where(bic >= 0, bic, 0)
        cand = pts3[safe]                         # (qb, kb, block, d)
        xnc = xn3[safe]                           # (qb, kb, block)
        rd = jnp.sum((qsc[:, None, None, :] - cand) ** 2, axis=-1)
        ok = jnp.isfinite(xnc) & (bic >= 0)[:, :, None]
        rd = jnp.where(ok, nan_to_inf(rd), jnp.inf)
        rows = safe[:, :, None] * block + off[None, None, :]
        return None, smallest_k(rd.reshape(-1, R),
                                rows.reshape(-1, R), k_eff)

    _, (bd, bix) = jax.lax.scan(body, None, (bi_b, qs_b))
    best_rd = bd.reshape(nbq * qb, k_eff)[:q]
    best_i = bix.reshape(nbq * qb, k_eff)[:q]
    best_i = jnp.where(jnp.isfinite(best_rd), best_i, -1)
    return best_rd, best_i


#: tie margin of the large-k compaction: entries beyond the exact k-th
#: cutoff the (Q, W) block can absorb before the row must repair
_BCAP_TIE_MARGIN = 64


def _bcap_rescore_large(pts_padded, xn_padded, queries, block_ids,
                        k_eff: int, block: int, interpret: bool):
    """Exact rescore + selection for LARGE-k bcap candidates (round 5).

    ``smallest_k`` (lax.top_k) and a full-width row sort are both walls
    at R = kb * block in the thousands (BENCH_NOTES round 3: ~225 ms+
    per kilolane of sorted width).  This path keeps the sorted width at
    ``W = k_eff + tie margin`` instead of R:

      1. exact direct-form rd over the R candidate rows (slab gather,
         streamed over query chunks — same as ``_bcap_rescore``), kept
         as one (Q, R) array;
      2. the exact k-th value per row by BIT-LEVEL BISECTION — rd >= 0,
         so its int32 bit pattern is order-isomorphic and 31 masked
         count-passes find the k-th smallest without any sort;
      3. entries <= cutoff compact (cumsum positions, drop-mode scatter)
         into a (Q, W) block — by construction >= k entries, all of the
         true top-k among them unless ties overflow the margin (then
         ``overflow`` marks the row for the caller's repair);
      4. one ascending row sort of width W (bitonic <= 2048, else
         counting-rank), sliced to k.

    Returns (rd (Q, k) ascending, ids (Q, k), overflow (Q,) bool).
    Rows with fewer than k finite candidates get a +inf cutoff: every
    finite entry compacts (in input order) and sorts first — exact, and
    never flagged (the caller's thr-based covered logic decides).
    """
    from .pallas.rank_sort_kernel import rank_sort_pairs
    from .pallas.sort_kernel import bitonic_sort_pairs

    q, kb = block_ids.shape
    n_pad, dim = pts_padded.shape
    pts3 = pts_padded.reshape(n_pad // block, block, dim)
    xn3 = xn_padded.reshape(n_pad // block, block)
    R = kb * block
    qb = max(8, min(512, (192 << 20) // max(R * dim * 4, 1) // 8 * 8))
    nbq = -(-q // qb)
    qpad = nbq * qb - q
    bi_b = jnp.pad(block_ids, ((0, qpad), (0, 0))).reshape(nbq, qb, kb)
    qs_b = jnp.pad(queries, ((0, qpad), (0, 0))).reshape(nbq, qb, dim)
    off = jnp.arange(block, dtype=jnp.int32)

    def body(_, xs):
        bic, qsc = xs
        safe = jnp.where(bic >= 0, bic, 0)
        cand = pts3[safe]                         # (qb, kb, block, d)
        xnc = xn3[safe]
        rd = jnp.sum((qsc[:, None, None, :] - cand) ** 2, axis=-1)
        ok = jnp.isfinite(xnc) & (bic >= 0)[:, :, None]
        rd = jnp.where(ok, nan_to_inf(rd), jnp.inf)
        rows = safe[:, :, None] * block + off[None, None, :]
        return None, (rd.reshape(qb, R), rows.reshape(qb, R))

    _, (rd, rows) = jax.lax.scan(body, None, (bi_b, qs_b))
    rd = rd.reshape(nbq * qb, R)[:q]
    rows = rows.reshape(nbq * qb, R)[:q]

    # ---- exact k-th cutoff by bisection on the f32 bit order ----------
    bits = jax.lax.bitcast_convert_type(rd, jnp.int32)   # rd >= 0: monotone
    inf_bits = jnp.int32(0x7F800000)

    def bstep(_, st):
        lo, hi = st
        mid = lo + (hi - lo) // 2
        c = jnp.sum(bits <= mid[:, None], axis=1)
        ge = c >= k_eff
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

    lo0 = jnp.zeros((q,), jnp.int32)
    hi0 = jnp.full((q,), inf_bits, jnp.int32)
    _, cutoff = jax.lax.fori_loop(0, 31, bstep, (lo0, hi0))

    # ---- compact entries <= cutoff into (Q, W) ------------------------
    W = min(R, -(-(k_eff + _BCAP_TIE_MARGIN) // 128) * 128)
    keep = bits <= cutoff[:, None]
    count = jnp.sum(keep, axis=1)
    pos = jnp.cumsum(keep, axis=1) - 1
    pos = jnp.where(keep & (pos < W), pos, W)            # W = dropped
    qrow = jnp.arange(q, dtype=jnp.int32)[:, None]
    cd = jnp.full((q, W + 1), jnp.inf, jnp.float32).at[qrow, pos].set(
        rd, mode="drop")[:, :W]
    cidx = jnp.full((q, W + 1), -1, jnp.int32).at[qrow, pos].set(
        rows, mode="drop")[:, :W]
    overflow = (count > W) & (cutoff < inf_bits)

    row_sort = rank_sort_pairs if W > 2048 else bitonic_sort_pairs
    sd, si = row_sort(cd, cidx, interpret=interpret)
    best_rd, best_i = sd[:, :k_eff], si[:, :k_eff]
    best_i = jnp.where(jnp.isfinite(best_rd), best_i, -1)
    return best_rd, best_i, overflow


#: largest k the fused path serves: the merge-scheme kernel's working
#: set is O(log k) passes per update, VMEM-bounded (~4096 at tq=64)
PALLAS_K_MAX = 4096 - RESCORE_SLACK


def _rescore_large(points, queries, idx, k: int, interpret: bool):
    """Direct-form rescore + re-rank for k_scan in the hundreds-to-
    thousands.

    ``rescore_exact`` materializes the whole (Q, k_scan, d) candidate
    block and re-ranks with ``lax.top_k`` — at k_scan ~ 4096 that is a
    multi-GB HBM blob and a TopK custom call over thousands of lanes
    (TopK was the round-1 serving bottleneck).  Here the gather +
    direct-form rescore stream over query chunks (lax.map keeps the
    transient <= ~64 MB) and the re-rank rides a Pallas row sort.  Same
    contract as ``rescore_exact``: (rdist, idx) ascending, (Q, k); NaN
    distances -> +inf (NaN-is-farthest); ids < 0 or >= n treated as
    missing.

    Re-rank engine by candidate width: past 2048 the counting-rank
    kernel (``ops.pallas.rank_sort_kernel``) replaces the bitonic
    network — counting rank is permute-free elementwise VPU work and
    pads to the 128-lane granule instead of a power of two, and wins
    exactly where the bitonic's pow2 pad doubles (measured same-window
    on 2048 rows, benchmarks/sort_probe.py: width 2056 rank 706 ms vs
    bitonic 1232 ms; 4096: 1686 vs 3088; bitonic keeps <= 2048, e.g.
    1032: 536 vs 626).
    """
    from .pallas.rank_sort_kernel import rank_sort_pairs
    from .pallas.sort_kernel import bitonic_sort_pairs

    q, dim = queries.shape
    n = points.shape[0]
    k_in = idx.shape[1]
    ok = (idx >= 0) & (idx < n)
    safe = jnp.where(ok, idx, 0)
    chunk = max(64, min(q, (1 << 24) // max(1, k_in * dim)))
    qpad = (-q) % chunk
    qs = jnp.pad(queries, ((0, qpad), (0, 0))) if qpad else queries
    sf = jnp.pad(safe, ((0, qpad), (0, 0))) if qpad else safe
    okp = jnp.pad(ok, ((0, qpad), (0, 0))) if qpad else ok

    def body(xs):
        qc, ic, oc = xs
        cand = points[ic]                         # (chunk, k_in, d)
        diff = qc[:, None, :] - cand
        rd = jnp.sum(diff * diff, axis=-1)
        return jnp.where(oc, nan_to_inf(rd), jnp.inf)

    rd = jax.lax.map(body, (qs.reshape(-1, chunk, dim),
                            sf.reshape(-1, chunk, k_in),
                            okp.reshape(-1, chunk, k_in)))
    rd = rd.reshape(-1, k_in)[:q]
    row_sort = rank_sort_pairs if k_in > 2048 else bitonic_sort_pairs
    sd, si = row_sort(rd, jnp.where(ok, idx, -1), interpret=interpret)
    return sd[:, :k], si[:, :k]


@partial(jax.jit, static_argnames=("k_eff", "n_real", "fast", "precision",
                                   "tq", "tn", "interpret", "normalize_q",
                                   "out_rdist", "scheme", "capped_passes",
                                   "bcap_tn", "bcap_tile"))
def knn_pallas_prepadded(pts_padded, xn_padded, queries, k_eff: int,
                         n_real: int, center=None, fast: bool = False,
                         precision: str | None = None,
                         tq: int | None = None, tn: int | None = None,
                         pts_split=None, interpret: bool = False,
                         normalize_q: bool = False, out_rdist: bool = False,
                         scheme: str | None = None,
                         capped_passes: int | None = None,
                         bcap_planes=None, bcap_tn: int | None = None,
                         bcap_tile: int | None = None):
    """Fused-kernel k-NN over an index pre-padded by ``pad_for_pallas``.

    ``pts_padded``/``xn_padded`` are expected pre-CENTERED (center_of);
    pass the same ``center`` so queries are shifted inside this program
    (one jitted program = one dispatch — each eager op costs a tunnel
    round-trip on remote devices).

    ``precision`` selects the candidate-pass matmul ("highest", "high",
    "bf16"; default "high", or "bf16" when legacy ``fast=True``).
    Reduced-precision passes are PROVEN exact per batch: a point outside
    the candidate set has approx distance >= the (k+slack)-th kept value
    ``thr``, hence true distance >= thr - err with err the pointwise
    rounding bound (PROOF_EPS).  If the re-scored k-th best <= thr - err
    for every query, no outside point can belong to the true top-k;
    otherwise the whole batch recomputes at "highest" (lax.cond, no host
    sync).  The "high" (bf16x3) pass runs the MXU at ~1.6x the
    f32-effective rate and its 2^-15-scale error bound holds with
    ~1000x margin on SIFT-scale distance gaps, so the fallback
    essentially never fires — unlike "bf16", whose 2^-8 bound fails on
    dense distance distributions (measured: both kernels run, 2.3x
    slower than f32-only).

    Exact in every mode: candidates are re-scored with the direct form
    and re-ranked (the same accuracy scheme as the XLA path).
    """
    from .pallas.knn_kernel import (knn_pallas, prepare_split,
                                    _check_split_integrity)

    if precision is None:
        precision = "bf16" if fast else "high"
    if precision == "high":
        # eager entry point: run the once-per-process split integrity
        # probe here (prepare_* may have been traced, where it defers)
        _check_split_integrity()
    if precision == "high" and pts_split is None:
        pts_split = prepare_split(pts_padded)
    dim = pts_padded.shape[1]
    if tn is None:
        tn = pallas_tile_n(dim)      # must match the pad_for_pallas tn
    if scheme is None:
        # round-3 sweep (BENCH_NOTES): capped (zero data-dependent
        # control flow + miss-threshold proof) serves small k at serving
        # scale — and LARGE k too, with ``passes`` scaled to the expected
        # per-tile survivor count lam = k_scan*tn/n (n >= 200*k keeps lam
        # <= ~20 and the miss-proof quantile margin wide); fold wins
        # k~128..512 at small corpora; the merge scheme's O(log k)
        # bitonic updates extend the fused path to PALLAS_K_MAX when the
        # corpus is too small for the capped proof (the old 90x cliff
        # onto the XLA TopK scan — round-2 judge #8).  two_phase is
        # opt-in: correct and tested, but measured 21k vs fold's 56k at
        # the headline.
        ks = min(k_eff + RESCORE_SLACK, n_real)
        if (ks <= 32 and n_real >= 262144 and not fast
                and bcap_planes is not None):
            # block-capped (round-4): capped extraction on the 32x
            # smaller per-block-minima tile — needs the index-resident
            # interleaved planes, so only plane-persisting callers route
            # here.  Cutover measured on the 1M x 128 corpus
            # (benchmarks/bcap_cutover_probe.py): bcap wins k=10 (92.3k
            # vs 75.9k) and k=24 (58.1k vs 25.1k); capped wins from
            # k=48 (33.7k vs 22.9k) — the slab rescore grows k-linearly
            # at 16 rows per block id while capped extraction cost is
            # pass-bounded.  ks <= 32 keeps bcap in its winning band
            # (the r4 bench k=100 regression 34.9k -> 16.4k was this
            # routing at ks=108).
            scheme = "bcap"
        elif ks <= 128 and n_real >= 262144 and not fast:
            scheme = "capped"
        elif (ks <= min(1024, tn) or 3072 <= ks <= min(4088, tn)) \
                and n_real >= 200 * ks and not fast:
            # capped beats fold/merge at every measured k <= 1016 (r3
            # sweep: 9.2k vs 5.1k at k=256 ... 2.4k vs 1.8k at k=1000)
            # and edges merge at k ~ 4080 (0.43k vs 0.36k); merge keeps
            # the 1024 < k_scan < 3072 band (1.43k vs 1.1k at k=2048)
            scheme = "capped"
        else:
            scheme = "fold" if k_eff + RESCORE_SLACK <= 640 else "merge"
    if center is not None:
        queries = queries - center
    if normalize_q:
        # cosine-through-the-Euclidean-kernel: the index holds normalized
        # rows (prepare_cosine_index); zero-norm queries become NaN rows
        # (the kernel's NaN-query policy: (+inf, -1) results)
        queries = queries / jnp.sqrt(
            jnp.sum(queries * queries, axis=-1, keepdims=True))
    q = queries.shape[0]
    k_scan = min(k_eff + RESCORE_SLACK, n_real)
    if scheme in ("merge", "capped") and k_scan > 1024:
        # large-k merge/capped blocks want a 128-multiple lane dimension
        # (Mosaic block-shape constraint); extra slack is harmless —
        # rescore slices back to k_eff
        k_scan = min(max(-(-k_scan // 128) * 128, 128), 4096)
        k_scan = max(k_scan, k_eff)
    if scheme == "capped" and k_scan > tn:
        # the capped kernel seeds its working set from tile 0's first k
        # columns, so k cannot exceed the tile; a forced scheme="capped"
        # downgrades rather than tripping the kernel assert
        scheme = "fold" if k_scan <= 640 else "merge"
    if tq is None:
        # 256 measured best at small k on the 1M x 128 headline; at
        # k > 128 the per-extraction working-set passes scale with tq·k
        # and tq=128 wins (k=264: 10.1k vs 6.8k QPS — round-2 sweep).
        # Past 1024 (merge scheme) the (tq, next_pow2(k)) merge buffers
        # bound VMEM: drop to 64 rows.  Small batches shouldn't pad to a
        # full query tile (the matmul cost scales with tq); 8 is the f32
        # sublane granule
        base_tq = 256 if k_scan <= 128 else (128 if k_scan <= 1024 else 64)
        tq = base_tq if q >= base_tq else -(-q // 8) * 8

    qpad = (-q) % tq
    qs = jnp.pad(queries, ((0, qpad), (0, 0)),
                 constant_values=jnp.nan) if qpad else queries

    def run(prec: str):
        # sort_output=False: rescore_exact re-ranks the candidate set, so
        # the kernel's k-pass extraction sort is pure waste (dominant at
        # large k); the proof threshold below uses the row MAX instead of
        # the last column
        if scheme in ("two_phase", "capped", "bcap", "bcap2"):
            # fallback engine for the proof-gated schemes; fold's
            # working set caps at 1024, merge covers the rest
            run_scheme = "fold" if k_scan <= 1024 else "merge"
        else:
            run_scheme = scheme
        rd, idx = knn_pallas(pts_padded, qs, xn_padded, k=k_scan, tq=tq,
                             tn=tn, precision=prec, sort_output=False,
                             scheme=run_scheme,
                             points_split=pts_split, interpret=interpret)
        rd, idx = rd[:q], idx[:q]
        # drop any padded-row ids (possible only when fewer than k_scan
        # finite candidates exist, e.g. NaN points with k ~ n)
        idx_ok = jnp.where(idx < n_real, idx, -1)
        if k_scan >= 512:
            best_rd, best_i = _rescore_large(pts_padded, queries, idx_ok,
                                             k_eff, interpret)
        else:
            best_rd, best_i = rescore_exact(pts_padded, queries, idx_ok,
                                            k_eff)
        return rd, best_rd, best_i

    def to_out(rd):
        # rd is ascending; sqrt needs the ulp-inversion clamp, the raw
        # rdistance domain (cosine callers apply an exact /2) does not
        return rd if out_rdist else monotone_distances(jnp.sqrt(rd))

    def prove_repair(covered, best_rd, best_i):
        # COMPACTED repair (shared by the proof-gated capped/bcap
        # schemes): a miss needs passes+1 members of a query's running
        # top set inside one tile — measured 22 of 10240 queries at
        # passes=2 on the 1M uniform headline — so a whole-batch
        # fallback would trigger almost every batch while touching
        # almost no queries, and a group-granular re-run still paid
        # ~12% of a full fold pass because scattered misses hit many
        # groups.  Instead: gather the uncovered queries into ONE dense
        # mini-batch (cap rows), run one fold instance on it, and
        # scatter the results back — repair cost is cap/q of a fold
        # pass regardless of how the misses scatter.  > cap uncovered
        # queries (adversarial data / tiny n) falls back to a full
        # "highest" pass; both repairs are slack-protected like the
        # precision="highest" serving path, so no proof is needed.
        cap = min(256, qs.shape[0])   # qs rows are a multiple of 8
        n_unc = jnp.sum(~covered)

        def _fix(args):
            brd, bi = args
            # uncovered-first permutation; NaN/padded rows are covered
            _, take = jax.lax.top_k((~covered).astype(jnp.float32), cap)
            qg = qs[take]
            # tq follows the caller's large-k policy (not cap): at
            # k_scan 4096 a tq=256 merge instance wants 96.5M of scoped
            # VMEM and fails to compile (r4, /tmp/largek4.log) — the
            # (tq, k) working buffers scale with tq*k
            rdg, idg = knn_pallas(
                pts_padded, qg, xn_padded, k=k_scan, tq=min(cap, tq), tn=tn,
                precision="highest", sort_output=False,
                scheme="fold" if k_scan <= 1024 else "merge",
                interpret=interpret)
            idg = jnp.where(idg < n_real, idg, -1)
            fr, fi = rescore_exact(pts_padded, qg, idg, k_eff)
            upd = (~covered)[take][:, None]
            brd = brd.at[take].set(jnp.where(upd, fr, brd[take]))
            bi = bi.at[take].set(jnp.where(upd, fi, bi[take]))
            return brd[:q], bi[:q]

        def _full(args):
            _, brd, bi = run("highest")
            return brd, bi

        return jax.lax.cond(
            n_unc == 0,
            lambda args: (args[0][:q], args[1][:q]),
            lambda args: jax.lax.cond(n_unc <= cap, _fix, _full, args),
            (best_rd, best_i))

    if scheme == "bcap":
        # Block-capped kernel (round-4 headline engine): capped
        # extraction on per-block minima — see _knn_kernel_bcap for the
        # kernel-side story and soundness argument.  The working set
        # holds kb BLOCK ids; each maps to `block` contiguous corpus
        # rows, gathered as slabs and exactly re-scored; the same
        # per-batch proof + compacted repair guard exactness.
        if bcap_planes is None:
            raise ValueError(
                "scheme='bcap' needs the index-resident interleaved "
                "planes (prepare_bcap_planes)")
        from .pallas.knn_kernel import BCAP_LANES
        p_perm, xn_perm = bcap_planes
        # ``bcap_tn`` = the GRANULE the planes were interleaved at (sets
        # block = the rows the rescore pays per candidate id);
        # ``bcap_tile`` = the kernel's point-tile width, a multiple of
        # the granule (sets the grid-step count — bigger tiles amortize
        # the per-step pipeline overhead without growing the rescore)
        btn = tn if bcap_tn is None else bcap_tn
        assert xn_perm.shape[0] % btn == 0, (xn_perm.shape, btn)
        tile = btn if bcap_tile is None else bcap_tile
        assert tile % btn == 0 and xn_perm.shape[0] % tile == 0, \
            (tile, btn, xn_perm.shape)
        block = btn // BCAP_LANES
        kb = min(max(k_eff + RESCORE_SLACK, 12),
                 (tile // btn) * BCAP_LANES)
        lam = kb * tile / n_real
        if capped_passes is not None:
            passes = capped_passes
        elif lam <= 0.5:
            passes = 2
        else:
            passes = min(48, math.ceil(lam + 3.0 * math.sqrt(lam) + 2.0))
        if precision == "high":
            _, bix, thr = knn_pallas(
                pts_padded, qs, xn_perm, k=kb, tq=tq, tn=tile,
                precision="high", scheme="bcap", passes=passes,
                granule=btn, points_split=p_perm, interpret=interpret)
        else:
            _, bix, thr = knn_pallas(
                p_perm, qs, xn_perm, k=kb, tq=tq, tn=tile,
                precision=precision, scheme="bcap", passes=passes,
                granule=btn, interpret=interpret)
        if k_eff * block > 1024:
            # large k: smallest_k's lax.top_k over R = kb*block lanes is
            # a wall (653 ms at ~1k width, r3) — bisect the exact k-th,
            # compact, and sort only W = k + margin lanes; tie-overflow
            # rows join the repair set
            best_rd, best_i, overflow = _bcap_rescore_large(
                pts_padded, xn_padded, qs, bix, k_eff, block, interpret)
        else:
            best_rd, best_i = _bcap_rescore(pts_padded, xn_padded, qs, bix,
                                            k_eff, block)
            overflow = jnp.zeros((qs.shape[0],), bool)
        qn = jnp.sum(qs * qs, axis=-1)
        xn_max = jnp.max(jnp.where(jnp.isfinite(xn_padded), xn_padded,
                                   0.0))
        err = _proof_err(precision, dim, qn, xn_max)
        covered = ((kb * block >= n_real)
                   | (best_rd[:, -1] <= thr - err)) & ~overflow
        # a non-finite k-th rescored value is covered ONLY when thr is
        # also non-finite (NaN query, or nothing finite was skipped —
        # miss_min/tau both +inf).  A finite thr with an inf k-th means
        # finite block minima WERE skipped by pass exhaustion while the
        # working set still held +inf seeds — must repair, not accept
        # (reachable only with forced tiny-n/NaN-heavy inputs, but the
        # old unconditional clause was a soundness hole there)
        covered = covered | (~jnp.isfinite(best_rd[:, -1])
                             & ~jnp.isfinite(thr))
        best_rd, best_i = prove_repair(covered, best_rd, best_i)
        return to_out(best_rd), best_i

    if scheme == "bcap2":
        # Two-phase block-capped (round 5, VERDICT r4 #1): phase A
        # streams per-block u-domain lane minima straight to HBM with
        # ZERO cross-grid-step state (_bcap_minima_kernel — pipelines
        # like the structural floor probe); phase B selects each
        # query's kb smallest block minima in XLA (lax.top_k over the
        # (Q, N/block) minima matrix) — the in-kernel extraction passes
        # and the scratch serialization the bcap kernel pays are gone,
        # traded for the minima matrix's HBM round-trip.  The selected
        # blocks' contiguous slabs are exactly re-scored and the same
        # per-batch proof + compacted repair certify exactness: an
        # unselected block's min >= thr (the kb-th selected min), so
        # every point outside the candidate set has true distance
        # >= thr - err.
        if bcap_planes is None:
            raise ValueError(
                "scheme='bcap2' needs the index-resident interleaved "
                "planes (prepare_bcap_planes)")
        from .pallas.knn_kernel import BCAP_LANES, bcap_minima
        p_perm, xn_perm = bcap_planes
        btn = tn if bcap_tn is None else bcap_tn
        assert xn_perm.shape[0] % btn == 0, (xn_perm.shape, btn)
        tile = btn if bcap_tile is None else bcap_tile
        assert tile % btn == 0 and xn_perm.shape[0] % tile == 0, \
            (tile, btn, xn_perm.shape)
        block = btn // BCAP_LANES
        nc = xn_perm.shape[0] // block
        kb = min(max(k_eff + RESCORE_SLACK, 12), nc)
        minima = bcap_minima(p_perm, qs, xn_perm, tq=tq, tn=tile,
                             granule=btn, precision=precision,
                             interpret=interpret)      # (Qpad, nc)
        neg, bix = jax.lax.top_k(-minima, kb)
        thr = -neg[:, -1]                              # u-domain
        if k_eff * block > 1024:
            best_rd, best_i, overflow = _bcap_rescore_large(
                pts_padded, xn_padded, qs, bix, k_eff, block, interpret)
        else:
            best_rd, best_i = _bcap_rescore(pts_padded, xn_padded, qs,
                                            bix, k_eff, block)
            overflow = jnp.zeros((qs.shape[0],), bool)
        qn = jnp.sum(qs * qs, axis=-1)
        thr = thr + qn                                 # rdist domain
        xn_max = jnp.max(jnp.where(jnp.isfinite(xn_padded), xn_padded,
                                   0.0))
        err = _proof_err(precision, dim, qn, xn_max)
        covered = ((kb * block >= n_real)
                   | (best_rd[:, -1] <= thr - err)) & ~overflow
        # NaN queries: minima row is NaN -> thr NaN; rescore gives
        # (+inf, -1) -> covered via the same non-finite clause as bcap
        covered = covered | (~jnp.isfinite(best_rd[:, -1])
                             & ~jnp.isfinite(thr))
        best_rd, best_i = prove_repair(covered, best_rd, best_i)
        return to_out(best_rd), best_i

    if scheme == "capped":
        # capped-pass kernel: no data-dependent control flow (pipelines
        # like the floor probe).  The kernel may SKIP true top-k members
        # when a tile has more survivors than passes; it emits a sound
        # per-query threshold thr = min(working-set max, skipped-score
        # floor), so the standard proof below certifies exactness — on
        # failure (adversarial data, tiny n) the fold kernel at
        # "highest" recomputes.  The proof is required even at
        # precision="highest": the miss risk is structural, not rounding.
        #
        # passes: the serving-scale small-k regimes keep the measured 2/4
        # settings (repair absorbs the rare miss); otherwise passes is
        # sized for the per-tile survivor count — a Poisson(lam =
        # k_scan*tn/n) variable whose worst tile over the batch the
        # fixed budget must cover, hence the +3*sqrt(lam) tail slack.
        lam = k_scan * tn / n_real
        if k_scan <= 32 and lam <= 0.5:
            passes = 2
        elif k_scan <= 128 and lam <= 2.0:
            passes = 4
        else:
            passes = min(48, math.ceil(lam + 3.0 * math.sqrt(lam) + 2.0))
        if capped_passes is not None:
            passes = capped_passes
        rd_a, idx, thr = knn_pallas(
            pts_padded, qs, xn_padded, k=k_scan, tq=tq, tn=tn,
            precision=precision, scheme="capped", passes=passes,
            points_split=pts_split if precision == "high" else None,
            interpret=interpret)
        idx_ok = jnp.where(idx < n_real, idx, -1)
        if k_scan >= 512:
            best_rd, best_i = _rescore_large(pts_padded, qs, idx_ok,
                                             k_eff, interpret)
        else:
            best_rd, best_i = rescore_exact(pts_padded, qs, idx_ok, k_eff)
        qn = jnp.sum(qs * qs, axis=-1)
        xn_max = jnp.max(jnp.where(jnp.isfinite(xn_padded), xn_padded,
                                   0.0))
        err = _proof_err(precision, dim, qn, xn_max)
        covered = (k_scan >= n_real) | (best_rd[:, -1] <= thr - err)
        # see the bcap branch: inf k-th is covered only with non-finite
        # thr (NaN query / nothing skipped) — a finite thr means finite
        # scores were pass-exhausted out of a working set holding +inf
        covered = covered | (~jnp.isfinite(best_rd[:, -1])
                             & ~jnp.isfinite(thr))
        best_rd, best_i = prove_repair(covered, best_rd, best_i)
        return to_out(best_rd), best_i

    if scheme == "two_phase":
        # control-flow-free minima kernel + exact candidate rescore
        # (the fold/merge while_loop costs 2.7x in lost pipelining at
        # small k — BENCH_NOTES round 3); the same per-batch proof
        # guards the approx threshold, falling back to the fold kernel
        # at "highest" when it cannot certify
        best_rd, best_i, T = _two_phase_small_k(
            pts_padded, xn_padded, queries, k_eff, precision, pts_split,
            tn, interpret)
        qn = jnp.sum(queries * queries, axis=-1)
        xn_max = jnp.max(jnp.where(jnp.isfinite(xn_padded), xn_padded,
                                   0.0))
        err = _proof_err(precision, dim, qn, xn_max)
        covered = best_rd[:, -1] <= T + qn - err
        # inf k-th covered only when the threshold itself is non-finite
        # (NaN query); a finite threshold demands the precise fallback
        covered = covered | (~jnp.isfinite(best_rd[:, -1])
                             & ~jnp.isfinite(T + qn))
        ok = jnp.all(covered)

        def precise2(_):
            _, brd, bi = run("highest")
            return brd, bi

        best_rd, best_i = jax.lax.cond(
            ok, lambda _: (best_rd, best_i), precise2, operand=None)
        return to_out(best_rd), best_i

    if precision == "highest":
        _, best_rd, best_i = run("highest")
        return to_out(best_rd), best_i

    rd_a, best_rd, best_i = run(precision)
    # ---- exactness proof for the reduced-precision candidate pass ----
    qn = jnp.sum(queries * queries, axis=-1)
    xn_max = jnp.max(jnp.where(jnp.isfinite(xn_padded), xn_padded, 0.0))
    # dim * 2^-24 term: worst-case f32 accumulation error of the d-term
    # dot product (sum|q_i x_i| <= (qn+xn)/2 by AM-GM, sequential-sum
    # bound d*eps) — negligible at SIFT dims, dominant at d ~ 4096+ so
    # the proof stays sound instead of silently optimistic there
    err = (4.0 * PROOF_EPS[precision] + dim * 2.0 ** -24) * (qn + xn_max)
    # the (k+slack)-th approx distance = working-set max (output unsorted)
    thr = jnp.max(rd_a, axis=1)
    covered = (k_scan >= n_real) | (best_rd[:, -1] <= thr - err)
    # NaN queries (padding) have inf everywhere: treat as covered
    covered = covered | ~jnp.isfinite(best_rd[:, -1])
    ok = jnp.all(covered)

    def precise(_):
        _, brd, bi = run("highest")
        return brd, bi

    best_rd, best_i = jax.lax.cond(
        ok, lambda _: (best_rd, best_i), precise, operand=None)
    return to_out(best_rd), best_i


@partial(jax.jit, static_argnames=("tn",))
def prepare_lp_index(points, tn: int):
    """One jitted program deriving the Lp-kernel-resident arrays:
    NaN-zeroed padded points + the additive +inf exclusion mask + the
    NaN-row flags (for the XLA fallback's ``invalid``)."""
    from .pallas.lp_kernel import pad_for_lp

    bad = jnp.any(jnp.isnan(points), axis=-1)
    ppad, mask = pad_for_lp(points, tn=tn, bad=bad)
    return ppad, mask, bad


@partial(jax.jit, static_argnames=("k_eff", "n_real", "spec", "metric",
                                   "tq", "tn", "interpret"))
def lp_knn_prepadded(pts_padded, mask, queries, k_eff: int, n_real: int,
                     *, spec, metric: Metric, tq: int | None = None,
                     tn: int = 512, interpret: bool = False):
    """Fused Lp/Chebyshev k-NN over an index padded by ``pad_for_lp`` —
    the generic-metric analogue of ``knn_pallas_prepadded``.  No rescore
    or proof machinery: the direct power-sum is exact to f32 rounding
    (no cancellation), so the kernel's reduced distances are final;
    conversion (p-th root) happens here with the ascending clamp."""
    from .pallas.lp_kernel import lp_knn_pallas

    q = queries.shape[0]
    if tq is None:
        base_tq = 128 if k_eff <= 1024 else 64
        tq = base_tq if q >= base_tq else -(-q // 8) * 8
    qpad = (-q) % tq
    qs = jnp.pad(queries, ((0, qpad), (0, 0)),
                 constant_values=jnp.nan) if qpad else queries
    rd, idx = lp_knn_pallas(pts_padded, mask, qs, k=k_eff, spec=spec,
                            tq=tq, tn=tn, interpret=interpret)
    rd, idx = rd[:q], idx[:q]
    idx = jnp.where(idx < n_real, idx, -1)
    rd = jnp.where(idx < 0, jnp.inf, rd)
    return monotone_distances(metric.rdistance_to_distance(rd)), idx


@partial(jax.jit, static_argnames=("k", "metric", "chunk", "rescore"))
def _knn_jit(points, queries, invalid, *, k, metric, chunk, rescore):
    return _knn_impl(points, queries, None, invalid, k, metric, chunk,
                     rescore)


@partial(jax.jit, static_argnames=("k", "metric", "chunk", "rescore"))
def _knn_jit_norms(points, queries, point_norms, invalid, *, k, metric,
                   chunk, rescore):
    return _knn_impl(points, queries, point_norms, invalid, k, metric,
                     chunk, rescore)


def _knn_impl(points, queries, point_norms, invalid, k: int,
              metric: Metric, chunk: int, rescore: bool):
    """Exact k nearest neighbors of ``queries`` (Q, d) among ``points`` (n, d).

    Returns ``(distances, indices)`` with shape (Q, k_eff), sorted
    ascending, ``k_eff = min(k, n)``; ``k == 0`` gives empty arrays
    (reference contract, ball_tree.rs:106-108; k > n returns n results).
    NaN distances sort as +inf (CHANGELOG.md:111-115).

    ``rescore``: for high-dim Euclidean, the streaming pass uses the
    MXU-matmul squared-distance form, which loses relative accuracy by
    cancellation when distances are tiny versus the norms; the final
    top-(k + slack) candidates are then re-scored with the direct
    (q-x)^2 form and re-ranked, restoring exact-to-rounding distances.
    """
    n, dim = points.shape
    q = queries.shape[0]
    k_eff = k                       # caller guarantees 1 <= k <= n
    do_rescore = (rescore and isinstance(metric, Euclidean)
                  and dim > DIRECT_DIM_MAX)
    k_scan = min(k_eff + RESCORE_SLACK, n) if do_rescore else k_eff

    c = chunk
    n_chunks = -(-n // c)
    n_pad = n_chunks * c
    if n_pad != n:
        points = jnp.pad(points, ((0, n_pad - n), (0, 0)))
    chunks = points.reshape(n_chunks, c, dim)

    use_norms = isinstance(metric, Euclidean)
    if use_norms:
        qn = jnp.sum(queries * queries, axis=-1)
        if point_norms is not None:
            # PAD provided norms, never recompute: an index's resident
            # copy may hold zeroed NaN rows whose exclusion lives in the
            # +inf norms (recomputing would resurrect them as real rows)
            xn = (jnp.pad(point_norms, (0, n_pad - n),
                          constant_values=jnp.inf)
                  if n_pad != n else point_norms)
        else:
            xn = jnp.sum(points * points, axis=-1)
        xn_chunks = xn.reshape(n_chunks, c)
    else:
        xn_chunks = jnp.zeros((n_chunks, c), dtype=points.dtype)
    if invalid is not None:
        inv_pad = (jnp.pad(invalid, (0, n_pad - n), constant_values=True)
                   if n_pad != n else invalid)
        inv_chunks = inv_pad.reshape(n_chunks, c)
    else:
        inv_chunks = jnp.zeros((n_chunks, c), dtype=bool)

    col = jnp.arange(c, dtype=jnp.int32)

    def body(carry, chunk_in):
        best_d, best_i = carry
        pts, xn_c, inv_c, base = chunk_in
        if use_norms:
            rd = metric.rdist_with_norms(queries, pts, qn, xn_c)
        else:
            rd = metric.rdist(queries, pts)
        ids = base + col
        ok = (ids[None, :] < n) & ~inv_c[None, :]
        rd = jnp.where(ok, nan_to_inf(rd), jnp.inf)
        # New candidates go first so a real point at +inf (NaN coords sort
        # farthest, CHANGELOG.md:111-115) beats the -1/inf init sentinel
        # on the positional tie-break.
        best_d, best_i = merge_topk(
            rd, jnp.broadcast_to(ids[None, :], rd.shape),
            best_d, best_i, k_scan)
        return (best_d, best_i), None

    init = (jnp.full((q, k_scan), jnp.inf, dtype=points.dtype),
            jnp.full((q, k_scan), -1, dtype=jnp.int32))
    bases = (jnp.arange(n_chunks, dtype=jnp.int32) * c)
    (best_rd, best_i), _ = jax.lax.scan(
        body, init, (chunks, xn_chunks, inv_chunks, bases))

    # mask any padded-row ids (possible only at inf ties with NaN-coordinate
    # points when k ~ n); they must never leak as out-of-range indices nor
    # re-score against the zero-padded rows
    best_i = jnp.where(best_i < n, best_i, -1)
    if invalid is not None:
        # invalid rows are selectable only at +inf ties (k ~ finite count)
        # — they must never reach the rescore with their placeholder
        # values nor surface as results
        best_i = jnp.where(invalid[jnp.maximum(best_i, 0)] & (best_i >= 0),
                           -1, best_i)
    if do_rescore:
        best_rd, best_i = rescore_exact(points, queries, best_i, k_eff)
    # invalid queries (NaN coords; zero-norm for cosine): every distance
    # is NaN -> +inf, and the positional tie-break above would otherwise
    # surface arbitrary real ids — align with the fused kernel's
    # (+inf, -1) policy (round-2 advisor finding)
    qbad = metric.invalid_queries(queries)[:, None]
    dists = monotone_distances(metric.rdistance_to_distance(best_rd))
    return (jnp.where(qbad, jnp.inf, dists),
            jnp.where(qbad, -1, best_i))


def radius_mask(points, queries, radius, metric: Metric | None = None,
                *, inclusive: bool = True, chunk: int | None = None,
                invalid=None, amb_cap: int = 256):
    """Boolean membership mask (Q, n): distance-to-query within ``radius``.

    ``inclusive=True`` uses ``d <= r``. The reference's single-query leaf
    filter is strict ``d < r`` while its whole-subtree take is ``ub <= r``
    (ball_tree.rs:271-277); the tree layer reproduces that exact boundary
    behavior — this brute-force op exposes both so callers can choose.
    NaN distances never match (NaN -> +inf).

    ``invalid``: optional (n,) bool — rows that can never match.  Passed
    by indexes whose resident representation zeroes NaN rows (the padded
    kernel copy): the zeroed coordinates would otherwise produce real
    distances instead of the NaN-never-matches contract.

    High-dim f32 Euclidean corpora take the MXU matmul path with a
    boundary band (see ``_radius_mask_matmul_jit``); in the
    astronomically rare case that more than ``amb_cap`` points per query
    land inside the ±err band around the radius, it falls back to the
    direct path (one extra dispatch; a warning is raised).
    """
    metric = metric or Euclidean()
    points = jnp.asarray(points)
    queries = jnp.asarray(queries)
    n, dim = points.shape
    if invalid is None:
        invalid = jnp.zeros((n,), dtype=bool)
    r = jnp.asarray(radius, dtype=points.dtype)
    if (isinstance(metric, Euclidean) and dim > DIRECT_DIM_MAX
            and n >= 4096 and points.dtype == jnp.float32
            and queries.dtype == jnp.float32):
        c = _pick_chunk(n, queries.shape[0], dim, chunk, direct=False)
        mask, overflow = _radius_mask_matmul_jit(
            points, queries, metric.distance_to_rdistance(r), invalid,
            inclusive=inclusive, chunk=c, cap=min(amb_cap, c))
        if not bool(overflow):
            return mask
        warnings.warn(
            f"radius_mask: > {amb_cap} points per query within the "
            "matmul-form error band of the radius; re-running the direct "
            "path for exact boundary decisions", RuntimeWarning,
            stacklevel=2)
    c = _pick_chunk(n, queries.shape[0], dim, chunk,
                    direct=isinstance(metric, Euclidean))
    return _radius_mask_jit(points, queries, r, invalid, metric=metric,
                            inclusive=inclusive, chunk=c)


@partial(jax.jit, static_argnames=("metric", "inclusive", "chunk"))
def _radius_mask_jit(points, queries, radius, invalid, *, metric, inclusive,
                     chunk):
    n, dim = points.shape
    q = queries.shape[0]
    rr = metric.distance_to_rdistance(radius)

    c = chunk
    n_chunks = -(-n // c)
    n_pad = n_chunks * c
    if n_pad != n:
        points = jnp.pad(points, ((0, n_pad - n), (0, 0)))
        invalid = jnp.pad(invalid, (0, n_pad - n), constant_values=True)
    chunks = points.reshape(n_chunks, c, dim)
    inv_chunks = invalid.reshape(n_chunks, c)
    col = jnp.arange(c, dtype=jnp.int32)

    def body(_, chunk_in):
        pts, inv, base = chunk_in
        if isinstance(metric, Euclidean):
            # direct form at any dim: membership is a two-sided boundary
            # test the matmul form's cancellation error would flip
            diff = queries[:, None, :] - pts[None, :, :]
            rd = nan_to_inf(jnp.sum(diff * diff, axis=-1))
        else:
            rd = nan_to_inf(metric.rdist(queries, pts))
        m = (rd <= rr) if inclusive else (rd < rr)
        m = m & ((base + col)[None, :] < n) & ~inv[None, :]
        return None, m

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * c
    _, masks = jax.lax.scan(body, None, (chunks, inv_chunks, bases))
    # (n_chunks, q, c) -> (q, n)
    return jnp.moveaxis(masks, 0, 1).reshape(q, n_pad)[:, :n]


def _radius_band(dim: int) -> float:
    """Worst-case pointwise |matmul_rd − direct_rd| factor (of qn+xn_max)
    for the f32-HIGHEST ``qn + xn − 2q·x`` form: sequential-sum
    accumulation of the three d-term dot products (each <= dim·eps·(qn+xn)
    via AM-GM on |q_i·x_i|) plus the final term additions.  SOUND, not
    stochastic — a single misclassified pair outside the rescored sliver
    would break the exactness invariant (round-2 advisor finding; the
    sibling k-NN proof at PROOF_EPS uses the same dim-proportional term).
    The wider band only costs more ambiguous-sliver rescoring; overflow of
    the ambiguity cap falls back to the all-direct path."""
    return (8.0 + 2.0 * dim) * 2.0 ** -24


@partial(jax.jit, static_argnames=("inclusive", "chunk", "cap"))
def _radius_mask_matmul_jit(points, queries, rr, invalid, *, inclusive,
                            chunk, cap):
    """High-dim Euclidean radius membership via the MXU matmul form.

    The direct path materializes a (Q, c, dim) difference tensor — at
    960-d that is ~dim× the HBM traffic of a matmul, throttling GIST-1M
    radius sweeps to seconds per batch.  Here each chunk costs one
    HIGHEST-precision matmul; membership is decided in three bands:

      rd_m <  rr − err   certain IN  (true rd ≤ rd_m + err < rr, so the
                         decision holds under BOTH boundary rules)
      rd_m >  rr + err   certain OUT (true rd ≥ rd_m − err > rr)
      otherwise          ambiguous — collected (≤ ``cap`` ids/query) and
                         re-decided with the direct (q−x)² form

    err = _radius_band(dim)·(‖q‖² + max‖x‖²) — the sound worst-case
    accumulation bound; callers pass CENTERED data so the band stays
    ~1e-4 of the data scale (uncentered data only inflates the band →
    more rescoring / overflow fallback, never wrong results).
    Returns (mask (Q, n) bool, overflow bool) — ``overflow`` means some
    query exceeded ``cap`` ambiguous ids and the caller must re-run the
    direct path.
    """
    n, dim = points.shape
    q = queries.shape[0]
    qn = jnp.sum(queries * queries, axis=-1)                   # (q,)
    xn = jnp.sum(points * points, axis=-1)                     # (n,)
    # NaN-row norms are NaN — they must not poison the error band (their
    # rd is NaN -> +inf -> certain-out regardless)
    xn_max = jnp.max(jnp.where(invalid | ~jnp.isfinite(xn), 0.0, xn))
    err = _radius_band(dim) * (qn + xn_max)                    # (q,)

    c = chunk
    n_chunks = -(-n // c)
    n_pad = n_chunks * c
    if n_pad != n:
        points = jnp.pad(points, ((0, n_pad - n), (0, 0)))
        invalid = jnp.pad(invalid, (0, n_pad - n), constant_values=True)
        xn = jnp.pad(xn, (0, n_pad - n))
    chunks = points.reshape(n_chunks, c, dim)
    xn_chunks = xn.reshape(n_chunks, c)
    inv_chunks = invalid.reshape(n_chunks, c)
    col = jnp.arange(c, dtype=jnp.int32)
    slot = jnp.arange(2 * cap, dtype=jnp.int32)

    def body(carry, chunk_in):
        ids, count = carry
        pts, xn_c, inv, base = chunk_in
        cross = jnp.dot(queries, pts.T,
                        precision=jax.lax.Precision.HIGHEST)
        rd = nan_to_inf(qn[:, None] + xn_c[None, :] - 2.0 * cross)
        ok = ((base + col)[None, :] < n) & ~inv[None, :]
        sure = (rd < rr - err[:, None]) & ok
        amb = ~sure & (rd <= rr + err[:, None]) & ok
        # chunk-local compaction: first `cap` ambiguous columns
        vals, _ = jax.lax.top_k(jnp.where(amb, -col, -(c + 1)), cap)
        ids_c = jnp.where(vals > -(c + 1), base - vals, n)     # sentinel n
        # order-preserving merge with the carried list
        allids = jnp.concatenate([ids, ids_c], axis=1)         # (q, 2cap)
        key = jnp.where(allids < n, slot, 2 * cap + 1)
        _, pos = jax.lax.top_k(-key, cap)
        ids = jnp.take_along_axis(allids, pos, axis=1)
        count = count + jnp.sum(amb, axis=1, dtype=jnp.int32)
        return (ids, count), sure

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * c
    init = (jnp.full((q, cap), n, dtype=jnp.int32),
            jnp.zeros((q,), dtype=jnp.int32))
    (amb_ids, amb_count), sure = jax.lax.scan(
        body, init, (chunks, xn_chunks, inv_chunks, bases))
    mask = jnp.moveaxis(sure, 0, 1).reshape(q, n_pad)[:, :n]

    member = _amb_rescore(points, queries, amb_ids, rr, inclusive, n)
    rows = jnp.arange(q, dtype=jnp.int32)[:, None]
    mask = mask.at[rows, jnp.minimum(amb_ids, n - 1)].max(member)
    return mask, jnp.any(amb_count > cap)


def _amb_rescore(points, queries, ids, rr, inclusive, n: int):
    """Direct-form membership for the ambiguous ids, chunked over query
    blocks so the (qb, cap, dim) gather stays ~tens of MB."""
    q, cap = ids.shape
    dim = queries.shape[1]
    qb = min(128, q)
    nb = -(-q // qb)
    qpad = nb * qb - q
    ids_b = jnp.pad(ids, ((0, qpad), (0, 0)),
                    constant_values=n).reshape(nb, qb, cap)
    qs_b = jnp.pad(queries, ((0, qpad), (0, 0))).reshape(nb, qb, dim)

    def body(_, xs):
        idb, qsb = xs
        ok = idb < n
        cand = points[jnp.where(ok, idb, 0)]                  # (qb, cap, d)
        rd = nan_to_inf(jnp.sum((qsb[:, None, :] - cand) ** 2, axis=-1))
        mem = (rd <= rr) if inclusive else (rd < rr)
        return None, mem & ok

    _, mem = jax.lax.scan(body, None, (ids_b, qs_b))
    return mem.reshape(nb * qb, cap)[:q]


def radius_counts(mask):
    """Per-query neighbor counts from a membership mask."""
    return jnp.sum(mask, axis=-1).astype(jnp.int32)


def _stream_setup(points, queries, metric, chunk, invalid):
    """Shared prep for the streaming (mask-free) radius ops."""
    metric = metric or Euclidean()
    points = jnp.asarray(points)
    queries = jnp.asarray(queries)
    n = points.shape[0]
    if invalid is None:
        invalid = jnp.zeros((n,), dtype=bool)
    c = _pick_chunk(n, queries.shape[0], points.shape[1], chunk,
                    direct=isinstance(metric, Euclidean))
    return metric, points, queries, invalid, c


def radius_counts_streaming(points, queries, radius,
                            metric: Metric | None = None, *,
                            inclusive: bool = True, invalid=None,
                            chunk: int | None = None):
    """Per-query within-radius counts WITHOUT materializing the (Q, n)
    mask: one streamed scan over point chunks, (Q,) output.  The memory
    footprint is O(Q·chunk) regardless of n — the corpus-scale discipline
    the dense ``radius_mask`` path cannot offer (a 10k-query sweep over a
    1M-row corpus would hold a 10 GB mask).

    Membership uses the direct difference form (exact boundary decisions
    at any dim — same rationale as ``_radius_mask_jit``)."""
    metric, points, queries, invalid, c = _stream_setup(
        points, queries, metric, chunk, invalid)
    r = jnp.asarray(radius, dtype=points.dtype)
    return _radius_counts_stream_jit(points, queries, r, invalid,
                                     metric=metric, inclusive=inclusive,
                                     chunk=c)


def radius_capped(points, queries, radius, metric: Metric | None = None,
                  *, cap: int, inclusive: bool = True, invalid=None,
                  chunk: int | None = None):
    """Streaming capped radius search: (ids (Q, cap), counts (Q,)) without
    ever materializing the (Q, n) mask.

    ``ids`` holds each query's first ``cap`` member ids in ASCENDING id
    order, -1 padded; ``counts`` is exact regardless of ``cap`` (the
    enlarge-and-retry overflow signal: ``counts > cap`` means the list was
    truncated).  Boundary rule per ``inclusive`` (d <= r vs strict d < r);
    NaN rows never match; ``invalid`` rows never match."""
    metric, points, queries, invalid, c = _stream_setup(
        points, queries, metric, chunk, invalid)
    r = jnp.asarray(radius, dtype=points.dtype)
    return _radius_capped_jit(points, queries, r, invalid, metric=metric,
                              inclusive=inclusive, chunk=c,
                              cap=min(cap, points.shape[0]))


def _member_chunk(pts, queries, rr, metric, inclusive):
    """(Q, c) membership of one point chunk — direct form, NaN -> +inf."""
    if isinstance(metric, Euclidean):
        diff = queries[:, None, :] - pts[None, :, :]
        rd = nan_to_inf(jnp.sum(diff * diff, axis=-1))
    else:
        rd = nan_to_inf(metric.rdist(queries, pts))
    return (rd <= rr) if inclusive else (rd < rr)


def _chunked_points(points, invalid, chunk):
    n, dim = points.shape
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    if n_pad != n:
        points = jnp.pad(points, ((0, n_pad - n), (0, 0)))
        invalid = jnp.pad(invalid, (0, n_pad - n), constant_values=True)
    return (points.reshape(n_chunks, chunk, dim),
            invalid.reshape(n_chunks, chunk),
            jnp.arange(n_chunks, dtype=jnp.int32) * chunk)


@partial(jax.jit, static_argnames=("metric", "inclusive", "chunk"))
def _radius_counts_stream_jit(points, queries, radius, invalid, *, metric,
                              inclusive, chunk):
    n = points.shape[0]
    rr = metric.distance_to_rdistance(radius)
    chunks, inv_chunks, bases = _chunked_points(points, invalid, chunk)
    col = jnp.arange(chunk, dtype=jnp.int32)

    def body(cnt, chunk_in):
        pts, inv, base = chunk_in
        m = _member_chunk(pts, queries, rr, metric, inclusive)
        m = m & ((base + col)[None, :] < n) & ~inv[None, :]
        return cnt + jnp.sum(m, axis=1, dtype=jnp.int32), None

    cnt, _ = jax.lax.scan(body, jnp.zeros((queries.shape[0],), jnp.int32),
                          (chunks, inv_chunks, bases))
    return cnt


@partial(jax.jit, static_argnames=("metric", "inclusive", "chunk", "cap"))
def _radius_capped_jit(points, queries, radius, invalid, *, metric,
                       inclusive, chunk, cap):
    """Streamed compaction: per chunk, compact member columns locally
    (top_k over negated positions), then order-preserving-merge into the
    carried (Q, cap) id list — the same sentinel-slot merge the ambiguous
    band of ``_radius_mask_matmul_jit`` uses.  Carried ids stay globally
    ascending because chunks arrive in id order."""
    n = points.shape[0]
    q = queries.shape[0]
    rr = metric.distance_to_rdistance(radius)
    chunks, inv_chunks, bases = _chunked_points(points, invalid, chunk)
    col = jnp.arange(chunk, dtype=jnp.int32)
    kc = min(cap, chunk)
    slot = jnp.arange(cap + kc, dtype=jnp.int32)

    def body(carry, chunk_in):
        ids, cnt = carry
        pts, inv, base = chunk_in
        m = _member_chunk(pts, queries, rr, metric, inclusive)
        m = m & ((base + col)[None, :] < n) & ~inv[None, :]
        vals, _ = jax.lax.top_k(jnp.where(m, -col, -(chunk + 1)), kc)
        ids_c = jnp.where(vals > -(chunk + 1), base - vals, n)  # sentinel n
        allids = jnp.concatenate([ids, ids_c], axis=1)          # (q, cap+kc)
        key = jnp.where(allids < n, slot, cap + kc + 1)
        _, pos = jax.lax.top_k(-key, cap)
        ids = jnp.take_along_axis(allids, pos, axis=1)
        cnt = cnt + jnp.sum(m, axis=1, dtype=jnp.int32)
        return (ids, cnt), None

    init = (jnp.full((q, cap), n, dtype=jnp.int32),
            jnp.zeros((q,), dtype=jnp.int32))
    (ids, cnt), _ = jax.lax.scan(body, init, (chunks, inv_chunks, bases))
    return jnp.where(ids < n, ids, -1), cnt


@partial(jax.jit, static_argnames=("metric",))
def distances_at(points, queries, ids, metric: Metric):
    """Exact distances from each query to ITS OWN id list: (Q, cap) from
    ids (Q, cap), -1 (or out-of-range) entries -> +inf.  Streamed over
    query blocks so the (block, cap, dim) gather stays ~tens of MB —
    the companion to ``radius_capped`` for distance-returning radius APIs
    that must not materialize (Q, n) anything."""
    n, dim = points.shape
    q, cap = ids.shape
    qb = min(128, q)
    nb = -(-q // qb)
    qpad = nb * qb - q
    ids_b = jnp.pad(ids, ((0, qpad), (0, 0)),
                    constant_values=-1).reshape(nb, qb, cap)
    qs_b = jnp.pad(queries, ((0, qpad), (0, 0))).reshape(nb, qb, dim)

    def body(_, xs):
        idb, qsb = xs
        ok = (idb >= 0) & (idb < n)
        cand = points[jnp.where(ok, idb, 0)]                   # (qb, cap, d)
        rd = nan_to_inf(metric.rowwise_rdist(qsb[:, None, :], cand))
        return None, jnp.where(ok, rd, jnp.inf)

    _, rd = jax.lax.scan(body, None, (ids_b, qs_b))
    rd = rd.reshape(nb * qb, cap)[:q]
    # missing/NaN entries stay +inf through the conversion (Haversine's
    # conversion clips its domain and would map inf to pi otherwise)
    return jnp.where(jnp.isinf(rd), jnp.inf,
                     metric.rdistance_to_distance(rd))


@partial(jax.jit, static_argnames=("cap",))
def compact_mask(mask, cap: int):
    """Compact a (Q, n) boolean mask into (indices (Q, cap), counts (Q,)).

    The first ``cap`` member indices per query, ascending; padding is -1.
    This is the masked-segment-output scheme for variable-length results
    under XLA static shapes (SURVEY.md §7 "hard parts").
    """
    q, n = mask.shape
    pos = jnp.arange(n, dtype=jnp.int32)
    # top_k of (-pos) picks smallest positions first; masked-out entries get
    # -(n+1) which loses to every real position.
    vals, _ = jax.lax.top_k(jnp.where(mask, -pos, -(n + 1)), min(cap, n))
    idx = -vals
    counts = radius_counts(mask)
    valid = jnp.arange(idx.shape[-1], dtype=jnp.int32)[None, :] < counts[:, None]
    idx = jnp.where(valid, idx, -1)
    if cap > n:
        idx = jnp.pad(idx, ((0, 0), (0, cap - n)), constant_values=-1)
    return idx, counts
