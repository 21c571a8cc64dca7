"""Sharded exact k-NN primitives (shard_map + XLA collectives).

All three schemes return exact results (bitwise equal to the single-device
path up to floating-point reduction order): top-k merging is associative,
and padding rows are NaN so the NaN-is-farthest policy keeps them out of
every result (CHANGELOG.md:111-115 put to work as a padding mechanism).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..distance import Euclidean, Metric
from ..ops import bruteforce as bf
from ..ops.topk import monotone_distances, smallest_k

__all__ = ["default_mesh", "knn_query_sharded", "knn_points_sharded",
           "knn_feature_sharded", "knn_ring", "tree_query_sharded",
           "radius_query_sharded", "radius_points_sharded",
           "mutual_reachability_mst_sharded"]


def init_distributed(**kwargs) -> None:
    """Multi-host initialization (thin wrapper over
    ``jax.distributed.initialize``).

    On a multi-host pod slice call this once per host before building
    meshes; ``default_mesh`` then sees every chip in the slice and the
    same sharded-search code runs unchanged — collectives ride ICI within
    a slice and DCN across slices (no custom transport, SURVEY.md §2.7).
    Single-host (including this CI environment) never needs it.
    """
    import jax

    jax.distributed.initialize(**kwargs)


def default_mesh(n_devices: int | None = None,
                 axis_names=("shards",)) -> Mesh:
    """A 1-D (or factored) mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(axis_names) == 1:
        return Mesh(np.array(devs[:n]), axis_names)
    # factor n into a 2-D mesh as evenly as possible
    a = int(np.floor(np.sqrt(n)))
    while n % a:
        a -= 1
    return Mesh(np.array(devs[:n]).reshape(a, n // a), axis_names)


def _pad_rows_nan(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Pad rows up to a multiple with NaN (sorts farthest, never selected)."""
    n = x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad, x.shape[1]), jnp.nan, dtype=x.dtype)], axis=0)


# ---------------------------------------------------------------------------
# scheme 1: query DP — queries sharded, index replicated
# ---------------------------------------------------------------------------

def knn_query_sharded(points, queries, k: int, metric: Metric | None = None,
                      *, mesh: Mesh, axis: str = "shards"):
    """Queries sharded over ``axis``, points replicated on every device.

    No collectives at all — each device answers its own query shard.
    Returns (distances, indices) sharded like the queries.
    """
    metric = metric or Euclidean()
    points = jnp.asarray(points)
    queries = jnp.asarray(queries)
    nd = mesh.shape[axis]
    qpad = _pad_rows_nan(queries, nd)
    k_eff = min(int(k), points.shape[0])

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), P(axis)), out_specs=(P(axis), P(axis)))
    def run(pts, qs):
        return bf.knn(pts, qs, k_eff, metric)

    d, i = run(points, qpad)
    return d[: queries.shape[0]], i[: queries.shape[0]]


def tree_query_sharded(tree, queries, k: int, *, mesh: Mesh,
                       axis: str = "shards", chunk_leaves: int = 4):
    """Query-DP over a replicated **BallTree**: each device runs the
    lockstep tree traversal for its own query shard (and stops pruning
    independently — no cross-device sync inside the loop).

    Returns (distances, indices) for all queries, exact.
    """
    from ..trees import ball_query

    queries = jnp.asarray(queries, dtype=tree.points.dtype)
    k_eff = min(int(k), tree.n)
    nd = mesh.shape[axis]
    qpad = _pad_rows_nan(queries, nd)
    norms = tree._perm_norms
    has_norms = norms is not None
    in_specs = ((P(), P(), P(), P(), P(), P(), P(axis))
                if has_norms else (P(), P(), P(), P(), P(axis)))

    def run(*args):
        if has_norms:
            pp, pn, oi, lc, lr, ctr, qs = args
        else:
            pp, oi, lc, lr, qs = args
            pn = ctr = None
        return ball_query.knn_query(
            pp, pn, oi, lc, lr, qs, ctr, k=k_eff, shape=tree.shape,
            metric=tree.metric, chunk_leaves=chunk_leaves)

    run = jax.shard_map(run, mesh=mesh, check_vma=False,
                        in_specs=in_specs, out_specs=(P(axis), P(axis)))
    args = ((tree._points_perm, norms, tree._orig_ids, tree._leaf_centroids,
             tree._leaf_radii, tree._qcenter, qpad) if has_norms else
            (tree._points_perm, tree._orig_ids, tree._leaf_centroids,
             tree._leaf_radii, qpad))
    d, i = run(*args)
    return d[: queries.shape[0]], i[: queries.shape[0]]


def radius_query_sharded(points, queries, radius,
                         metric: Metric | None = None, *, mesh: Mesh,
                         axis: str = "shards", cap: int | None = None,
                         inclusive: bool = True):
    """Query-DP radius search: queries sharded, points replicated.

    ``cap=None`` returns per-query neighbor COUNTS (the DBSCAN minPts
    core test); with ``cap`` returns ``(ids (Q, cap), counts)`` — ids
    ascending, -1 padded, counts exact past the cap (the masked-segment
    scheme, SURVEY.md §7).  No collectives — each device answers its own
    query shard.
    """
    metric = metric or Euclidean()
    points = jnp.asarray(points)
    queries = jnp.asarray(queries)
    nd = mesh.shape[axis]
    qpad = _pad_rows_nan(queries, nd)    # NaN queries match nothing
    r = jnp.asarray(radius, dtype=points.dtype)
    c = bf._pick_chunk(points.shape[0], qpad.shape[0] // nd,
                       points.shape[1], None,
                       direct=isinstance(metric, Euclidean))
    inv = jnp.zeros((points.shape[0],), dtype=bool)
    out_specs = P(axis) if cap is None else (P(axis), P(axis))

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), P(axis)), out_specs=out_specs)
    def run(pts, qs):
        # the direct-form path (trace-safe — the matmul-band wrapper's
        # overflow fallback is a host-side decision)
        mask = bf._radius_mask_jit(pts, qs, r, inv, metric=metric,
                                   inclusive=inclusive, chunk=c)
        if cap is None:
            return bf.radius_counts(mask)
        return bf.compact_mask(mask, cap)

    out = run(points, qpad)
    nq = queries.shape[0]
    if cap is None:
        return out[:nq]
    return out[0][:nq], out[1][:nq]


# ---------------------------------------------------------------------------
# scheme 2: point sharding — points sharded, queries replicated
# ---------------------------------------------------------------------------

def knn_points_sharded(points, queries, k: int, metric: Metric | None = None,
                       *, mesh: Mesh, axis: str = "shards"):
    """Points row-sharded over ``axis``; local exact top-k per shard, then
    an ``all_gather`` of the P k-lists and an exact merge.

    Index memory per chip = n/P rows — the scheme for indexes larger than
    one chip's HBM when queries fit everywhere.
    """
    metric = metric or Euclidean()
    points = jnp.asarray(points)
    queries = jnp.asarray(queries)
    n = points.shape[0]
    nd = mesh.shape[axis]
    ppad = _pad_rows_nan(points, nd)
    rows = ppad.shape[0] // nd
    k_eff = min(int(k), n)
    k_local = min(k_eff, rows)

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(axis), P()), out_specs=(P(), P()))
    def run(pts_shard, qs):
        base = jax.lax.axis_index(axis) * rows
        d, i = bf.knn(pts_shard, qs, k_local, metric)
        # NaN padding rows sit at inf distance; at inf TIES (real NaN
        # points) they can still be selected — mask any id that lands in
        # the padded tail so no out-of-range index ever escapes
        gi = jnp.where((i >= 0) & (i + base < n), i + base, -1)
        all_d = jax.lax.all_gather(d, axis)          # (P, Q, k_local)
        all_i = jax.lax.all_gather(gi, axis)
        q = qs.shape[0]
        flat_d = jnp.moveaxis(all_d, 0, 1).reshape(q, nd * k_local)
        flat_i = jnp.moveaxis(all_i, 0, 1).reshape(q, nd * k_local)
        return smallest_k(flat_d, flat_i, k_eff)

    return run(ppad, queries)


def radius_points_sharded(points, queries, radius,
                          metric: Metric | None = None, *, mesh: Mesh,
                          axis: str = "shards", cap: int | None = None,
                          inclusive: bool = True):
    """Points row-sharded radius search: each device scans its point
    shard; counts combine with a ``psum`` over ICI.  With ``cap``, local
    capped id lists (global ids) are ``all_gather``-ed and re-compacted
    to the first ``cap`` ids in ascending global order — identical
    output contract to the single-device ``compact_mask``.

    Index memory per chip = n/P rows: the > HBM radius/DBSCAN scheme.
    """
    metric = metric or Euclidean()
    points = jnp.asarray(points)
    queries = jnp.asarray(queries)
    n = points.shape[0]
    nd = mesh.shape[axis]
    ppad = _pad_rows_nan(points, nd)     # NaN rows never match
    rows = ppad.shape[0] // nd
    r = jnp.asarray(radius, dtype=points.dtype)
    c = bf._pick_chunk(rows, queries.shape[0], points.shape[1], None,
                       direct=isinstance(metric, Euclidean))
    inv = jnp.zeros((rows,), dtype=bool)
    cap_local = None if cap is None else min(cap, rows)
    out_specs = P() if cap is None else (P(), P())

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(axis), P()), out_specs=out_specs)
    def run(pts_shard, qs):
        base = jax.lax.axis_index(axis) * rows
        mask = bf._radius_mask_jit(pts_shard, qs, r, inv, metric=metric,
                                   inclusive=inclusive, chunk=c)
        counts = jax.lax.psum(bf.radius_counts(mask), axis)
        if cap is None:
            return counts
        ids_l, _ = bf.compact_mask(mask, cap_local)
        gids = jnp.where(ids_l >= 0, ids_l + base, n + 1)
        all_ids = jax.lax.all_gather(gids, axis)       # (P, Q, cap_local)
        q = qs.shape[0]
        flat = jnp.moveaxis(all_ids, 0, 1).reshape(q, nd * cap_local)
        # first `cap` valid ids in ascending global order (compact_mask
        # contract); top_k of the negated ids picks the smallest
        vals, _ = jax.lax.top_k(-flat, min(cap, flat.shape[1]))
        ids = -vals
        valid = (jnp.arange(ids.shape[1], dtype=jnp.int32)[None, :]
                 < counts[:, None]) & (ids <= n)
        ids = jnp.where(valid, ids, -1)
        if cap > ids.shape[1]:
            ids = jnp.pad(ids, ((0, 0), (0, cap - ids.shape[1])),
                          constant_values=-1)
        return ids, counts

    return run(ppad, queries)


# ---------------------------------------------------------------------------
# scheme 2b: tensor parallelism — the FEATURE axis sharded; partial
# distances reduced with psum over ICI (SURVEY.md §2.7 TP row)
# ---------------------------------------------------------------------------

def knn_feature_sharded(points, queries, k: int,
                        metric: Metric | None = None, *, mesh: Mesh,
                        axis: str = "shards", chunk: int = 4096):
    """Points AND queries sharded over the feature (d) axis: each device
    computes the partial squared-distance contribution of its feature
    slice and a ``psum`` over ICI completes every pairwise term before
    the top-k — the classic tensor-parallel contraction layout, for
    dimensionalities too wide for one chip's working set.

    Exact (the psum reconstructs the full squared distance; ties resolve
    identically on every device).  Euclidean only.
    """
    metric = metric or Euclidean()
    if not isinstance(metric, Euclidean):
        raise ValueError("feature sharding requires the Euclidean metric "
                         "(additive over feature slices)")
    points = jnp.asarray(points)
    queries = jnp.asarray(queries)
    n, dim = points.shape
    q = queries.shape[0]
    nd = mesh.shape[axis]
    dpad = (-dim) % nd
    if dpad:  # zero columns contribute 0 to squared distances
        points = jnp.pad(points, ((0, 0), (0, dpad)))
        queries = jnp.pad(queries, ((0, 0), (0, dpad)))
    k_eff = min(int(k), n)
    c = min(chunk, n)
    n_chunks = -(-n // c)
    n_pad = n_chunks * c

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(None, axis), P(None, axis)), out_specs=(P(), P()))
    def run(pts_f, qs_f):
        # feature slices: pts_f (n, d/nd), qs_f (q, d/nd)
        pp = jnp.pad(pts_f, ((0, n_pad - n), (0, 0))) if n_pad != n else pts_f
        chunks = pp.reshape(n_chunks, c, pts_f.shape[1])
        col = jnp.arange(c, dtype=jnp.int32)

        def body(carry, chunk_in):
            best_d, best_i = carry
            pc, base = chunk_in
            diff = qs_f[:, None, :] - pc[None, :, :]
            rd_part = jnp.sum(diff * diff, axis=-1)        # partial sq-dist
            rd = jax.lax.psum(rd_part, axis)               # full sq-dist
            ids = base + col
            rd = jnp.where(ids[None, :] < n,
                           jnp.where(jnp.isnan(rd), jnp.inf, rd), jnp.inf)
            return smallest_k(jnp.concatenate([rd, best_d], axis=1),
                              jnp.concatenate(
                                  [jnp.broadcast_to(ids[None], rd.shape),
                                   best_i], axis=1), k_eff), None

        init = (jnp.full((q, k_eff), jnp.inf, dtype=pts_f.dtype),
                jnp.full((q, k_eff), -1, dtype=jnp.int32))
        bases = jnp.arange(n_chunks, dtype=jnp.int32) * c
        (bd, bi), _ = jax.lax.scan(body, init, (chunks, bases))
        return monotone_distances(jnp.sqrt(bd)), bi

    return run(points, queries)


# ---------------------------------------------------------------------------
# scheme 3: ring — queries AND points sharded; point shards rotate (ppermute)
# ---------------------------------------------------------------------------

def knn_ring(points, queries, k: int, metric: Metric | None = None,
             *, mesh: Mesh, query_axis: str = "q", point_axis: str = "p"):
    """2-D mesh ring search: queries sharded over ``query_axis``, points
    over ``point_axis``.  Each of the P ring steps computes a local exact
    top-k of the resident query shard against the current point shard and
    merges it into the running result, then rotates the point shard (and
    its global row offset) one hop with ``ppermute`` over ICI.

    After P hops every query shard has seen every point shard; the merged
    top-k is exact, and the result is replicated along ``point_axis``
    (every device in a query row computes identical lists).
    """
    metric = metric or Euclidean()
    points = jnp.asarray(points)
    queries = jnp.asarray(queries)
    n = points.shape[0]
    nq = mesh.shape[query_axis]
    npnt = mesh.shape[point_axis]
    qpad = _pad_rows_nan(queries, nq)
    ppad = _pad_rows_nan(points, npnt)
    rows = ppad.shape[0] // npnt
    k_eff = min(int(k), n)
    k_local = min(k_eff, rows)
    perm = [(j, (j + 1) % npnt) for j in range(npnt)]

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(point_axis), P(query_axis)),
        out_specs=(P(query_axis), P(query_axis)))
    def run(pts_shard, qs_shard):
        me = jax.lax.axis_index(point_axis)
        base0 = (me * rows).astype(jnp.int32)
        q = qs_shard.shape[0]

        def step(carry, _):
            best_d, best_i, pts, base = carry
            d, i = bf.knn(pts, qs_shard, k_local, metric)
            # same padded-tail guard as knn_points_sharded
            gi = jnp.where((i >= 0) & (i + base < n), i + base, -1)
            best_d, best_i = smallest_k(
                jnp.concatenate([d, best_d], axis=1),
                jnp.concatenate([gi, best_i], axis=1), k_eff)
            # rotate the point shard one hop around the ring (ICI traffic
            # overlapped with the next step's local compute by XLA)
            pts = jax.lax.ppermute(pts, point_axis, perm)
            base = jax.lax.ppermute(base, point_axis, perm)
            return (best_d, best_i, pts, base), None

        init = (jnp.full((q, k_eff), jnp.inf, dtype=pts_shard.dtype),
                jnp.full((q, k_eff), -1, dtype=jnp.int32),
                pts_shard, base0)
        (best_d, best_i, *_), _ = jax.lax.scan(step, init, None, length=npnt)
        # every device in a query row now holds identical exact results;
        # pmax over identical values is a bit-exact no-op that marks the
        # output replicated over the point axis for shard_map
        best_d = jax.lax.pmax(best_d, point_axis)
        best_i = jax.lax.pmax(best_i, point_axis)
        return best_d, best_i

    d, i = run(ppad, qpad)
    return d[: queries.shape[0]], i[: queries.shape[0]]


def mutual_reachability_mst_sharded(points, k: int, *, mesh: Mesh,
                                    axis: str = "shards",
                                    qchunk: int | None = None,
                                    nchunk: int | None = None):
    """Mesh-sharded HDBSCAN mutual-reachability MST (scan scheme).

    The Borůvka scan path is query-row parallel end to end, so both of
    its device stages shard the QUERY rows over ``axis`` with the corpus
    replicated (the mirror of ``knn_query_sharded``):

    * **core distances** — each device runs the streaming k-th-NN scan
      (``_core_scan_block``) on its row shard: n/P of the n×n work per
      chip, no collectives.
    * **Borůvka rounds** — each device computes the minimum OUTGOING
      mutual-reachability edge of its rows (``_scan_minout``); shard_map
      reassembles the (n,) per-point minima and the per-component winner
      combine (O(n) scatter-min, ``_combine_winners``) runs replicated.

    The host union-find driver (``_run_rounds``) and the exactness
    contract (weights equal the dense-matrix MST's to f32 rounding) are
    shared with the single-device path — the dryrun cross-checks the
    weight multiset against it on the virtual 8-device mesh.

    Reference lineage: the accessors this consumer rides exist for
    petal-clustering's HDBSCAN (/root/reference/src/ball_tree.rs:303-353);
    the reference itself has no distribution story (SURVEY.md §2.7).

    Returns (us, vs, ws): n-1 edges, original point ids, numpy arrays.
    """
    from ..trees.boruvka import (_combine_winners, _core_scan_block,
                                 _run_rounds, _scan_minout)
    from ..utils.validation import check_points

    pts = check_points(points)
    n, dim = pts.shape
    if n < 2:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.float64))
    if bool(jnp.any(jnp.isnan(pts))):
        raise ValueError(
            "mutual_reachability_mst requires finite points: a NaN row "
            "has +inf mutual reachability to everything and the MST is "
            "undefined")
    kk = min(int(k), n)
    nd = mesh.shape[axis]
    rows = -(-n // nd)
    npad = rows * nd
    # shrink the streaming tiles to the shard size (tiny meshes/tests
    # would otherwise pad 64 rows up to the 4096-row serving tile)
    qc = min(qchunk or 4096, max(rows, 8))
    nc = min(nchunk or 16384, max(n, 8))

    qpad = jnp.pad(pts, ((0, npad - n), (0, 0)))  # zero rows, sliced off

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), P(axis)), out_specs=P(axis))
    def core_run(pts_rep, q_shard):
        out = _core_scan_block(pts_rep, q_shard, k=kk, qchunk=qc, nchunk=nc)
        return out[:rows]

    core = core_run(pts, qpad)[:n]
    core_rd = core * core
    inf_pad = jnp.full((npad - n,), jnp.inf, core_rd.dtype)
    cq_pad = jnp.concatenate([core_rd, inf_pad])  # padded q rows -> (inf,-1)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)))
    def minout_run(pts_rep, crd_rep, comp_rep, q_s, cq_s, cmp_s):
        return _scan_minout(pts_rep, crd_rep, comp_rep, q_s, cq_s, cmp_s,
                            qchunk=qc, nchunk=nc)

    combine = jax.jit(_combine_winners)

    def round_fn(comp):
        cmp_pad = jnp.concatenate(
            [comp, jnp.full((npad - n,), -1, comp.dtype)])
        bw, bj = minout_run(pts, core_rd, comp, qpad, cq_pad, cmp_pad)
        return combine(bw[:n], bj[:n], comp)

    return _run_rounds(n, round_fn, np.arange(n, dtype=np.int64))
