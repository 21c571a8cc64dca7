"""DynamicIndex: streaming inserts/deletes over an immutable tree.

The reference's indexes are build-once (SURVEY.md §5: rebuild-on-restart).
For serving, this wrapper adds an LSM-style mutable layer:

* **base segment** — a built ``BallTree`` over the live rows at the last
  rebuild (fast tree-pruned queries), with a stable-id side table;
* **delta segment** — rows added since, scanned brute-force inside the
  fused query programs (exact, no build cost);
* **tombstones** — pending deletes filtered out of results.

Queries fetch top-(k + #tombstones) from each segment, mask tombstones,
and take the exact k best of the union — exact at every moment.  When the
mutation load crosses ``rebuild_threshold`` of the base, ``rebuild()``
compacts: dead rows are dropped for good (memory stays proportional to
live rows), while ids remain stable forever (never reused).

k-NN *and radius* queries are each ONE fused device program
(``_fused_knn`` / ``_fused_radius``: base tree query + delta scan +
tombstone mask + merge), same dispatch count as the immutable indexes;
side-table shapes are padded to powers of two so the programs recompile
O(log #mutations) times, and the padded device state is cached between
queries (each host->device transfer is a tunnel RTT too).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from ..distance import Metric, get_metric
from ..ops.topk import smallest_k
from ..utils.validation import check_query, check_query_batch
from .ball import BallTree

__all__ = ["DynamicIndex"]


def _pow2_pad(n: int) -> int:
    """Next power of two (0 -> 0): pads dynamic-length side tables so jit
    recompiles O(log) times as mutations accumulate, not per mutation."""
    return 0 if n == 0 else 1 << (n - 1).bit_length()


@partial(jax.jit, static_argnames=("k_eff", "kb", "kd", "shape", "metric"))
def _fused_knn(points_perm, perm_norms, orig_ids, leaf_c, leaf_r, center,
               base_map, delta_rows, delta_map, tomb, qs, *,
               k_eff: int, kb: int, kd: int, shape, metric: Metric):
    """ONE device program for the two-segment query: base tree k-NN +
    delta brute scan + tombstone masking + exact merge.  The eager
    version cost 5-8 dispatches — each a tunnel round-trip (CLAUDE.md);
    measured ~6x worse than a single program on remote devices.

    ``kb``/``kd`` over-fetch each segment by (padded) #tombstones so dead
    rows cannot crowd out live candidates; padded delta rows are NaN
    (sort farthest) with -1 ids; padded tombstone slots are -1, which
    only ever mask already-dead (-1) entries."""
    from ..ops import bruteforce as bf
    from . import ball_query

    d, i = ball_query.knn_query(points_perm, perm_norms, orig_ids, leaf_c,
                                leaf_r, qs, center, k=kb, shape=shape,
                                metric=metric)
    i = jnp.where(i >= 0, base_map[jnp.maximum(i, 0)], -1)
    if kd:
        dd, di = bf.knn(delta_rows, qs, kd, metric, backend="xla")
        di = jnp.where(di >= 0, delta_map[jnp.maximum(di, 0)], -1)
        d = jnp.concatenate([d, dd], axis=1)
        i = jnp.concatenate([i, di], axis=1)
    if tomb is not None:
        dead = jnp.isin(i, tomb)
        d = jnp.where(dead, jnp.inf, d)
        i = jnp.where(dead, -1, i)
    return smallest_k(d, i, k_eff)


@partial(jax.jit, static_argnames=("cap", "fetch", "shape", "metric",
                                   "point_chunk"))
def _fused_radius(points_perm, orig_ids, centroids, radii, base_map,
                  delta_rows, delta_map, tomb, qs, r, *, cap: int,
                  fetch: int, shape, metric: Metric, point_chunk: int):
    """ONE device program for the two-segment capped radius query: base
    tree-pruned capped search (BallTree boundary semantics) + strict
    ``d < r`` streamed delta scan + tombstone filtering + compaction.
    Replaces the round-2 base-dispatch + delta-dispatch + host-side merge
    (each extra dispatch is a tunnel RTT, CLAUDE.md).

    Each segment is over-fetched to ``fetch = cap + #tombstone slots`` so
    dead rows cannot crowd out live ones; a segment count beyond even
    ``fetch`` forces the returned count above ``cap`` (the
    enlarge-and-retry signal) because the capped list would be
    incomplete.  NaN-padded delta rows never match; padded tombstone
    slots (-1) only ever mask already-dead (-1) entries."""
    from ..ops import bruteforce as bf
    from . import ball_query

    bi, bc = ball_query.radius_query_capped(
        points_perm, orig_ids, centroids, radii, qs, r, shape=shape,
        metric=metric, cap=fetch, point_chunk=point_chunk)
    overflow = bc > fetch
    bi = jnp.where(bi >= 0, base_map[jnp.maximum(bi, 0)], -1)
    cnt = bc
    if delta_rows is not None:
        di, dc = bf.radius_capped(delta_rows, qs, r, metric, cap=fetch,
                                  inclusive=False)
        overflow = overflow | (dc > fetch)
        di = jnp.where(di >= 0, delta_map[jnp.maximum(di, 0)], -1)
        bi = jnp.concatenate([bi, di], axis=1)
        cnt = cnt + dc
    if tomb is not None:
        dead = jnp.isin(bi, tomb) & (bi >= 0)
        cnt = cnt - jnp.sum(dead, axis=1).astype(cnt.dtype)
        bi = jnp.where(dead, -1, bi)
    # compact: real ids first (sort key pushes -1 entries last)
    order = jnp.argsort(bi < 0, axis=1, stable=True)
    bi = jnp.take_along_axis(bi, order, axis=1)[:, :cap]
    cnt = jnp.where(overflow, jnp.maximum(cnt, cap + 1), cnt)
    return bi, cnt


class DynamicIndex:
    """Exact k-NN index supporting add/remove between rebuilds."""

    def __init__(self, points, metric: Metric | str = "euclidean", *,
                 leaf_size: int | None = 128,
                 rebuild_threshold: float = 0.25):
        self.metric = get_metric(metric)
        self._leaf_size = leaf_size
        self.rebuild_threshold = float(rebuild_threshold)
        pts = np.asarray(points)
        self._base = BallTree(pts, self.metric, leaf_size=leaf_size)
        self._base_rows = np.asarray(self._base.points)
        self._base_ids = np.arange(pts.shape[0], dtype=np.int64)
        self._delta_rows: list[np.ndarray] = []
        self._delta_ids: list[np.ndarray] = []
        self._tombstones: set[int] = set()         # pending deletes (live ids)
        self._next_id = pts.shape[0]
        self._mut_cache = None                     # device mutation state
        self._base_map_dev = None

    @classmethod
    def _from_state(cls, base_rows, metric, leaf_size, centroids, radii,
                    idx, base_ids, delta_rows, delta_ids, tombstones,
                    next_id, rebuild_threshold):
        """Rehydrate from a checkpoint (utils.serialize): the base tree
        is restored from its arrays (no rebuild) and pending mutations
        (delta rows, tombstones) resume exactly where they were."""
        self = cls.__new__(cls)
        self.metric = get_metric(metric)
        self._leaf_size = leaf_size
        self.rebuild_threshold = float(rebuild_threshold)
        self._base = BallTree._from_arrays(base_rows, self.metric,
                                           leaf_size, centroids, radii, idx)
        self._base_rows = np.asarray(self._base.points)
        self._base_ids = np.asarray(base_ids, dtype=np.int64)
        delta_rows = np.asarray(delta_rows)
        self._delta_rows = [delta_rows] if len(delta_rows) else []
        self._delta_ids = ([np.asarray(delta_ids, dtype=np.int64)]
                           if len(delta_rows) else [])
        self._tombstones = set(int(t) for t in np.asarray(tombstones))
        self._next_id = int(next_id)
        self._mut_cache = None
        self._base_map_dev = None
        return self

    def save(self, path) -> None:
        """Checkpoint the full serving state — base tree, id table, and
        PENDING mutations — to an ``.npz`` (see utils.serialize)."""
        from ..utils.serialize import save_index
        save_index(self, path)

    # ------------------------------------------------------------------
    @property
    def dim(self) -> int:
        return self._base.dim

    @property
    def num_points(self) -> int:
        """Live points (added minus removed)."""
        return (len(self._base_ids)
                + sum(len(r) for r in self._delta_rows)
                - len(self._tombstones))

    def _live_ids(self) -> np.ndarray:
        ids = np.concatenate(
            [self._base_ids] + self._delta_ids
            if self._delta_ids else [self._base_ids])
        if self._tombstones:
            ids = np.setdiff1d(
                ids, np.fromiter(self._tombstones, dtype=np.int64,
                                 count=len(self._tombstones)))
        return ids

    def add(self, new_points) -> np.ndarray:
        """Insert rows; returns their stable ids (never reused)."""
        new = np.ascontiguousarray(
            np.asarray(new_points, dtype=self._base_rows.dtype))
        if new.ndim == 1:
            new = new[None, :]
        ids = np.arange(self._next_id, self._next_id + len(new))
        self._next_id += len(new)
        self._delta_rows.append(new)
        self._delta_ids.append(ids)
        self._invalidate_caches()
        self._maybe_rebuild()
        return ids

    def remove(self, ids) -> None:
        """Tombstone live ids.  Removing an already-removed (or never
        live) id is a no-op; out-of-range ids raise."""
        live = set(self._live_ids().tolist())
        pend = set()
        for i in np.atleast_1d(np.asarray(ids)):
            i = int(i)
            if not 0 <= i < self._next_id:
                raise IndexError(f"id {i} out of range")
            if i in live:
                pend.add(i)
        if len(pend) >= self.num_points and pend:
            raise ValueError(
                "cannot remove every remaining point: the index requires "
                "at least one live row (reference Empty contract)")
        self._tombstones.update(pend)
        self._invalidate_caches()
        self._maybe_rebuild()

    def rebuild(self) -> None:
        """Compact delta + tombstones into a fresh base tree.  Dead rows
        are dropped permanently; ids stay stable."""
        rows = np.concatenate([self._base_rows] + self._delta_rows, axis=0) \
            if self._delta_rows else self._base_rows
        ids = np.concatenate([self._base_ids] + self._delta_ids) \
            if self._delta_ids else self._base_ids
        if self._tombstones:
            gone = np.fromiter(self._tombstones, dtype=np.int64,
                               count=len(self._tombstones))
            alive = ~np.isin(ids, gone)
            rows, ids = rows[alive], ids[alive]
        self._base = BallTree(rows, self.metric, leaf_size=self._leaf_size)
        self._base_rows = rows
        self._base_ids = ids
        self._delta_rows = []
        self._delta_ids = []
        self._tombstones = set()
        self._invalidate_caches()

    def _maybe_rebuild(self) -> None:
        base_n = len(self._base_ids)
        load = (sum(len(r) for r in self._delta_rows)
                + len(self._tombstones))
        if base_n and load / base_n > self.rebuild_threshold:
            self.rebuild()

    # ------------------------------------------------------------------
    def _padded_mutation_state(self):
        """(delta_rows, delta_map, tomb) padded to power-of-two lengths
        (NaN rows / -1 ids / -1 tombstones) so the fused programs
        recompile O(log #mutations) times, not once per mutation.
        Device-cached between queries (invalidated by add/remove/rebuild):
        each host->device transfer costs a tunnel RTT."""
        if self._mut_cache is not None:
            return self._mut_cache
        dtype = self._base_rows.dtype
        if self._delta_rows:
            rows = np.concatenate(self._delta_rows, axis=0)
            ids = np.concatenate(self._delta_ids)
            m = _pow2_pad(len(rows))
            if m != len(rows):
                rows = np.concatenate(
                    [rows, np.full((m - len(rows), rows.shape[1]), np.nan,
                                   dtype=dtype)])
                ids = np.concatenate(
                    [ids, np.full(m - len(ids), -1, dtype=ids.dtype)])
            delta_rows = jnp.asarray(rows)
            delta_map = jnp.asarray(ids, dtype=jnp.int32)
        else:
            delta_rows = delta_map = None
        t = len(self._tombstones)
        if t:
            tp = _pow2_pad(t)
            tomb_np = np.full(tp, -1, dtype=np.int32)
            tomb_np[:t] = sorted(self._tombstones)
            tomb = jnp.asarray(tomb_np)
        else:
            tomb = None
        self._mut_cache = (delta_rows, delta_map, tomb)
        return self._mut_cache

    def _base_map(self):
        if self._base_map_dev is None:
            self._base_map_dev = jnp.asarray(self._base_ids,
                                             dtype=jnp.int32)
        return self._base_map_dev

    def _invalidate_caches(self) -> None:
        self._mut_cache = None
        self._base_map_dev = None

    def query_batch(self, queries, k: int):
        """Exact k nearest among live points, as ONE fused device
        program: per-segment over-fetch (so tombstones cannot crowd out
        live candidates), tombstone masking, one final exact selection
        (see ``_fused_knn``)."""
        qs = check_query_batch(queries, self.dim, self._base.points.dtype)
        k_eff = min(int(k), self.num_points)
        if k_eff == 0:
            return (jnp.zeros((qs.shape[0], 0),
                              dtype=self._base.points.dtype),
                    jnp.zeros((qs.shape[0], 0), dtype=jnp.int32))

        delta_rows, delta_map, tomb = self._padded_mutation_state()
        t_pad = 0 if tomb is None else tomb.shape[0]
        kb = min(k_eff + t_pad, len(self._base_ids))
        kd = 0 if delta_rows is None \
            else min(k_eff + t_pad, delta_rows.shape[0])
        base = self._base
        return _fused_knn(
            base._points_perm, base._perm_norms, base._orig_ids,
            base._leaf_centroids, base._leaf_radii, base._qcenter,
            self._base_map(),
            delta_rows, delta_map, tomb, qs,
            k_eff=k_eff, kb=kb, kd=kd, shape=base._shape,
            metric=self.metric)

    def query(self, point, k: int):
        qs = check_query(point, self.dim, self._base.points.dtype)
        d, i = self.query_batch(qs[None, :], k)
        return np.asarray(i[0]), np.asarray(d[0])

    def query_nearest(self, point):
        i, d = self.query(point, 1)
        return int(i[0]), float(d[0])

    def query_radius_batch(self, queries, distance, *, cap: int):
        """Capped radius search over live points: base (tree-pruned,
        BallTree boundary semantics) + delta segments, tombstones
        filtered.  Returns (ids (Q, cap), counts).

        Boundary rule: delta rows are scanned with the same strict
        ``d < r`` rule as the base tree's leaf path (a brute scan *is* a
        leaf scan), so a point keeps its membership when ``rebuild()``
        moves it from delta into the base — except through the base's own
        reference quirk (whole-subtree takes are inclusive ``ub <= r``,
        ball_tree.rs:271-277), which applies to every BallTree point.

        Each segment is over-fetched by the padded tombstone count so
        dead rows cannot crowd out live ones.  If a segment's raw
        within-radius count exceeds even the over-fetched capacity, the
        returned count is forced above ``cap`` — the standard
        enlarge-and-retry signal — because the capped list (and the
        tombstone correction) would otherwise be incomplete.

        ONE device program per call (``_fused_radius``), like the k-NN
        path — each extra dispatch is a tunnel RTT."""
        qs = check_query_batch(queries, self.dim, self._base.points.dtype)
        delta_rows, delta_map, tomb = self._padded_mutation_state()
        t_pad = 0 if tomb is None else tomb.shape[0]
        fetch = cap + t_pad
        base = self._base
        from ..ops.bruteforce import _pick_chunk
        chunk = _pick_chunk(base.n, qs.shape[0], base.dim, None, direct=True)
        return _fused_radius(
            base._points_perm, base._orig_ids, base._centroids,
            base._radii, self._base_map(), delta_rows, delta_map, tomb,
            qs, np.asarray(distance, dtype=base.points.dtype),
            cap=cap, fetch=fetch, shape=base._shape, metric=self.metric,
            point_chunk=chunk)

    def query_radius(self, point, distance):
        """Live ids within ``distance`` (sorted)."""
        qs = check_query(point, self.dim, self._base.points.dtype)
        ids, cnt = self.query_radius_batch(qs[None, :], distance,
                                           cap=self.num_points)
        out = np.asarray(ids[0])
        return np.sort(out[out >= 0]).astype(np.int64)
