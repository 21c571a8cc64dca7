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
        assert idx._delta is None            # folded into the base
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
