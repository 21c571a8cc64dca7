"""DynamicIndex: streaming inserts/deletes over an immutable tree.

The reference's indexes are build-once (SURVEY.md §5: rebuild-on-restart).
For serving, this wrapper adds an LSM-style mutable layer:

* **base segment** — a built ``BallTree`` (fast tree-pruned queries);
* **delta segment** — newly added rows in a ``BruteForce`` index (exact,
  no build cost; MXU-scanned);
* **tombstones** — deleted ids filtered out of results.

Queries merge the two exact segments (top-k merging is associative) and
are therefore exact at every moment.  When the delta or tombstone load
crosses ``rebuild_threshold`` of the base, ``rebuild()`` folds everything
into a fresh tree.  Ids are stable: each added row gets the next id; ids
never get reused.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..distance import Metric, get_metric
from ..ops.topk import merge_topk
from ..utils.validation import check_query, check_query_batch
from .ball import BallTree
from .bruteforce import BruteForce

__all__ = ["DynamicIndex"]


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
        self._delta_rows: list[np.ndarray] = []
        self._delta: BruteForce | None = None
        self._tombstones: set[int] = set()   # pending (pre-rebuild) deletes
        self._dead: set[int] = set()         # all deletes ever (ids reserved)
        self._next_id = pts.shape[0]

    # ------------------------------------------------------------------
    @property
    def dim(self) -> int:
        return self._base.dim

    @property
    def num_points(self) -> int:
        """Live points (added minus removed)."""
        return self._next_id - len(self._tombstones) - len(self._dead)

    def add(self, new_points) -> np.ndarray:
        """Insert rows; returns their stable ids."""
        new = np.asarray(new_points, dtype=self._base_rows.dtype)
        if new.ndim == 1:
            new = new[None, :]
        ids = np.arange(self._next_id, self._next_id + len(new))
        self._next_id += len(new)
        self._delta_rows.append(new)
        delta = np.concatenate(self._delta_rows, axis=0)
        self._delta = BruteForce(delta, self.metric)
        self._maybe_rebuild()
        return ids

    def remove(self, ids) -> None:
        """Tombstone ids (filtered from every subsequent query)."""
        for i in np.atleast_1d(np.asarray(ids)):
            if not 0 <= int(i) < self._next_id:
                raise IndexError(f"id {int(i)} out of range")
            self._tombstones.add(int(i))
        self._maybe_rebuild()

    def rebuild(self) -> None:
        """Fold delta + tombstones into a fresh base tree. Ids stay
        stable (removed rows keep their ids reserved, never reused)."""
        rows = [self._base_rows] + self._delta_rows
        all_rows = np.concatenate(rows, axis=0)
        self._dead |= self._tombstones
        gone = np.fromiter(self._dead, dtype=np.int64, count=len(self._dead))
        live = np.setdiff1d(np.arange(self._next_id), gone)
        self._id_map = live                   # position -> stable id
        self._base = BallTree(all_rows[live], self.metric,
                              leaf_size=self._leaf_size)
        self._base_rows = all_rows
        self._delta_rows = []
        self._delta = None
        self._tombstones = set()

    def _maybe_rebuild(self) -> None:
        base_n = self._base.n
        load = (sum(len(r) for r in self._delta_rows)
                + len(self._tombstones))
        if base_n and load / base_n > self.rebuild_threshold:
            self.rebuild()

    # ------------------------------------------------------------------
    def _map_base_ids(self, ids):
        """Base-tree positions -> stable ids (identity unless rebuilt)."""
        m = getattr(self, "_id_map", None)
        if m is None:
            return ids
        mm = jnp.asarray(m)
        return jnp.where(ids >= 0, mm[jnp.maximum(ids, 0)], -1)

    def query_batch(self, queries, k: int):
        """Exact k nearest among live points: tree segment + delta segment
        merged; tombstones filtered."""
        qs = check_query_batch(queries, self.dim, self._base.points.dtype)
        t = len(self._tombstones)
        k_eff = min(int(k), self.num_points)
        if k_eff == 0:
            return (jnp.zeros((qs.shape[0], 0)), jnp.zeros((qs.shape[0], 0),
                                                           dtype=jnp.int32))
        # over-fetch so tombstones can be filtered without a second pass
        k_fetch = min(k_eff + t, self._base.n)
        d, i = self._base.query_batch(qs, k_fetch)
        i = self._map_base_ids(i)
        if self._delta is not None:
            base_delta = self._next_id - self._delta.num_points
            kd = min(k_eff + t, self._delta.num_points)
            dd, di = self._delta.query_batch(qs, kd)
            di = jnp.where(di >= 0, di + base_delta, -1)
            d, i = merge_topk(dd, di, d, i, k_fetch)
        if t:
            tomb = jnp.asarray(sorted(self._tombstones), dtype=jnp.int32)
            dead = jnp.isin(i, tomb)
            d = jnp.where(dead, jnp.inf, d)
            i = jnp.where(dead, -1, i)
            d, i = merge_topk(d, i, d[:, :0], i[:, :0], k_fetch)  # re-sort
        return d[:, :k_eff], i[:, :k_eff]

    def query(self, point, k: int):
        qs = check_query(point, self.dim, self._base.points.dtype)
        d, i = self.query_batch(qs[None, :], k)
        return np.asarray(i[0]), np.asarray(d[0])

    def query_nearest(self, point):
        i, d = self.query(point, 1)
        return int(i[0]), float(d[0])
