"""DynamicIndex: exactness through adds/removes/rebuilds."""

import numpy as np
import pytest

from petal_neighbors_tpu.trees.dynamic import DynamicIndex


def oracle_ids(rows_by_id: dict, q, k):
    ids = np.array(sorted(rows_by_id))
    pts = np.stack([rows_by_id[i] for i in ids])
    d = ((pts - q[None]) ** 2).sum(1)
    return set(ids[np.argsort(d, kind="stable")[:k]].tolist())


class TestDynamic:
    def test_add_then_query(self, rng):
        pts = rng.uniform(0, 1, (100, 3)).astype(np.float32)
        idx = DynamicIndex(pts, rebuild_threshold=10.0)  # no auto rebuild
        new = rng.uniform(0, 1, (5, 3)).astype(np.float32)
        ids = idx.add(new)
        np.testing.assert_array_equal(ids, np.arange(100, 105))
        # a query at a new point must find it first
        i, d = idx.query(new[2], 1)
        assert i[0] == 102 and d[0] == pytest.approx(0.0, abs=1e-6)

    def test_matches_oracle_through_mutations(self, rng):
        pts = rng.uniform(0, 1, (60, 2)).astype(np.float32)
        idx = DynamicIndex(pts, rebuild_threshold=10.0)
        rows = {i: pts[i] for i in range(60)}
        new = rng.uniform(0, 1, (10, 2)).astype(np.float32)
        ids = idx.add(new)
        rows.update({int(i): r for i, r in zip(ids, new)})
        idx.remove([3, 64])
        del rows[3], rows[64]
        for _ in range(5):
            q = rng.uniform(0, 1, 2).astype(np.float32)
            got, _ = idx.query(q, 7)
            assert set(got.tolist()) == oracle_ids(rows, q, 7)

    def test_rebuild_preserves_ids(self, rng):
        pts = rng.uniform(0, 1, (50, 2)).astype(np.float32)
        idx = DynamicIndex(pts, rebuild_threshold=10.0)
        new = rng.uniform(0, 1, (6, 2)).astype(np.float32)
        ids = idx.add(new)
        idx.remove([0, int(ids[1])])
        idx.rebuild()
        assert idx.num_points == 54
        i, d = idx.query(new[0], 1)
        assert i[0] == ids[0] and d[0] == pytest.approx(0.0, abs=1e-6)
        # removed ids never come back
        got, _ = idx.query(pts[0], 50)
        assert 0 not in got.tolist() and int(ids[1]) not in got.tolist()

    def test_auto_rebuild_threshold(self, rng):
        pts = rng.uniform(0, 1, (40, 2)).astype(np.float32)
        idx = DynamicIndex(pts, rebuild_threshold=0.2)
        idx.add(rng.uniform(0, 1, (20, 2)).astype(np.float32))  # 50% > 20%
        assert idx._delta_rows == []         # folded into the base
        assert idx._base.n == 60

    def test_second_rebuild_keeps_dead(self, rng):
        pts = rng.uniform(0, 1, (30, 2)).astype(np.float32)
        idx = DynamicIndex(pts, rebuild_threshold=10.0)
        idx.remove([5])
        idx.rebuild()
        idx.add(rng.uniform(0, 1, (3, 2)).astype(np.float32))
        idx.rebuild()
        got, _ = idx.query(pts[5], 30)
        assert 5 not in got.tolist()
        assert idx.num_points == 32

    def test_remove_out_of_range(self, rng):
        idx = DynamicIndex(rng.uniform(0, 1, (10, 2)).astype(np.float32))
        with pytest.raises(IndexError):
            idx.remove([99])


class TestDynamicReviewFindings:
    def test_tombstone_cannot_crowd_out_delta(self, rng):
        """Review finding: per-segment fetch must keep live delta
        candidates even when dead base points are globally closest."""
        base = np.zeros((8, 2), dtype=np.float32)
        base[:, 0] = np.arange(8)              # base at x = 0..7
        idx = DynamicIndex(base, rebuild_threshold=10.0)
        ids = idx.add(np.array([[100.0, 0.0]], dtype=np.float32))
        idx.remove([0])                        # closest base point dies
        got, d = idx.query(np.array([0.0, 0.0], dtype=np.float32), 8)
        assert (got >= 0).all()
        assert set(got.tolist()) == {1, 2, 3, 4, 5, 6, 7, int(ids[0])}

    def test_remove_all_rejected(self, rng):
        idx = DynamicIndex(rng.uniform(0, 1, (4, 2)).astype(np.float32),
                           rebuild_threshold=10.0)
        with pytest.raises(ValueError):
            idx.remove([0, 1, 2, 3])
        assert idx.num_points == 4             # state unchanged

    def test_double_remove_idempotent(self, rng):
        idx = DynamicIndex(rng.uniform(0, 1, (10, 2)).astype(np.float32),
                           rebuild_threshold=10.0)
        idx.remove([5])
        idx.rebuild()
        idx.remove([5])                        # no-op, not double counted
        assert idx.num_points == 9
        got, _ = idx.query(np.zeros(2, dtype=np.float32), 9)
        assert len(got) == 9 and (got >= 0).all()

    def test_rebuild_compacts_memory(self, rng):
        pts = rng.uniform(0, 1, (100, 2)).astype(np.float32)
        idx = DynamicIndex(pts, rebuild_threshold=10.0)
        idx.remove(list(range(50)))
        idx.rebuild()
        assert len(idx._base_rows) == 50       # dead rows dropped for good
        idx.add(rng.uniform(0, 1, (5, 2)).astype(np.float32))
        idx.rebuild()
        assert len(idx._base_rows) == 55


class TestDynamicRadius:
    def test_radius_through_mutations(self, rng):
        pts = rng.uniform(0, 1, (80, 2)).astype(np.float32)
        idx = DynamicIndex(pts, rebuild_threshold=10.0)
        new = rng.uniform(0, 1, (8, 2)).astype(np.float32)
        ids = idx.add(new)
        idx.remove([2, int(ids[0])])
        rows = {i: pts[i] for i in range(80)}
        rows.update({int(i): r for i, r in zip(ids, new)})
        del rows[2], rows[int(ids[0])]
        q = rng.uniform(0, 1, 2).astype(np.float32)
        got = set(idx.query_radius(q, 0.3).tolist())
        live_ids = np.array(sorted(rows))
        live = np.stack([rows[i] for i in live_ids])
        d = np.sqrt(((live - q[None]) ** 2).sum(1))
        # off-boundary radius: strict/inclusive cannot differ here
        want = set(live_ids[d < 0.3].tolist())
        assert got == want


class TestDynamicRadiusReviewFindings:
    def test_tombstones_cannot_crowd_radius(self, rng):
        """Review: dead rows within radius must not displace live ones
        from the capped list, and counts must be exact."""
        pts = np.zeros((10, 2), dtype=np.float32)
        pts[:, 0] = np.arange(10) * 0.01          # all within r of origin
        idx = DynamicIndex(pts, rebuild_threshold=10.0)
        idx.remove([0, 1, 2])                     # 3 closest die
        ids, cnt = idx.query_radius_batch(
            np.zeros((1, 2), dtype=np.float32), 1.0, cap=7)
        ids, cnt = np.asarray(ids), np.asarray(cnt)
        got = set(ids[0][ids[0] >= 0].tolist())
        assert got == {3, 4, 5, 6, 7, 8, 9}
        assert cnt[0] == 7

    def test_remove_duplicate_ids_single_call(self, rng):
        idx = DynamicIndex(rng.uniform(0, 1, (2, 2)).astype(np.float32),
                           rebuild_threshold=10.0)
        idx.remove([0, 0])                        # duplicates = one removal
        assert idx.num_points == 1

    def test_haversine_dim_check(self):
        from petal_neighbors_tpu import BallTree, Haversine
        import pytest as _pt
        with _pt.raises(ValueError):
            BallTree(np.random.rand(10, 3), Haversine(), leaf_size=4)


class TestRadiusBoundaryUnification:
    def test_exact_boundary_point_strict_in_delta(self, rng):
        """A delta row at exactly distance r follows the strict leaf-scan
        rule (d < r): excluded before rebuild, and after rebuild it can
        only re-enter through the base tree's own reference quirk
        (inclusive whole-subtree takes) — identical to any BallTree point."""
        base = rng.standard_normal((40, 4)).astype(np.float64)
        d = DynamicIndex(base, leaf_size=4, rebuild_threshold=10.0)
        q = np.zeros(4)
        r = 2.0
        on_boundary = np.array([2.0, 0.0, 0.0, 0.0])   # exactly d == r
        inside = np.array([1.0, 0.0, 0.0, 0.0])        # d < r
        bid = d.add(on_boundary)[0]
        iid = d.add(inside)[0]
        got = d.query_radius(q, r)
        assert iid in got
        assert bid not in got
        # post-rebuild: strict leaf scan still excludes it unless a
        # wholly-contained node covers it (allowed reference behavior);
        # the d < r point must always stay in.
        d.rebuild()
        got2 = d.query_radius(q, r)
        assert iid in got2


class TestFusedRadiusSingleDispatch:
    """Round-3 item: the radius path is ONE fused device program like the
    k-NN path (was base dispatch + delta dispatch + host merge)."""

    def _mutated_index(self, rng):
        pts = rng.uniform(0, 1, (120, 3)).astype(np.float32)
        idx = DynamicIndex(pts, rebuild_threshold=10.0)
        idx.add(rng.uniform(0, 1, (17, 3)).astype(np.float32))
        idx.remove([3, 60, 121])
        return idx

    def test_radius_is_one_program(self, rng, count_device_programs):
        idx = self._mutated_index(rng)
        qs = np.asarray(idx._base_rows[:8])
        idx.query_radius_batch(qs, 0.3, cap=64)      # warm caches/transfers
        n, _ = count_device_programs(
            lambda: np.asarray(idx.query_radius_batch(qs, 0.3, cap=64)[0]))
        assert n == 1, f"radius dispatched {n} device programs, want 1"

    def test_knn_is_one_program(self, rng, count_device_programs):
        idx = self._mutated_index(rng)
        qs = np.asarray(idx._base_rows[:8])
        idx.query_batch(qs, 5)
        n, _ = count_device_programs(
            lambda: np.asarray(idx.query_batch(qs, 5)[0]))
        assert n == 1, f"knn dispatched {n} device programs, want 1"

    def test_fused_radius_matches_manual_merge(self, rng):
        """Exactness of the fused program vs a host-side oracle over the
        live rows (inclusive-take quirk only reachable via base tree)."""
        idx = self._mutated_index(rng)
        qs = rng.uniform(0, 1, (15, 3)).astype(np.float32)
        rows = np.concatenate([idx._base_rows]
                              + idx._delta_rows).astype(np.float64)
        ids_all = np.concatenate([idx._base_ids]
                                 + idx._delta_ids)
        live = ~np.isin(ids_all, sorted(idx._tombstones))
        d = np.sqrt(((qs[:, None].astype(np.float64)
                      - rows[None]) ** 2).sum(-1))
        ids, cnt = idx.query_radius_batch(qs, 0.35, cap=200)
        ids, cnt = np.asarray(ids), np.asarray(cnt)
        for row in range(len(qs)):
            got = np.sort(ids[row][ids[row] >= 0])
            # boundary-agnostic check: no point sits exactly at r here
            want = np.sort(ids_all[live & (d[row] < 0.35)])
            np.testing.assert_array_equal(got, want)
            assert cnt[row] == len(want)
