"""Checkpoint / resume tests: save -> load must restore indexes
bit-identically (no rebuild) and preserve query results exactly."""

import numpy as np
import pytest

from petal_neighbors_tpu import (
    BallTree, BruteForce, Minkowski, VantagePointTree, load_index, save_index,
)


class TestBallRoundTrip:
    def test_bit_identical(self, rng, tmp_path):
        pts = rng.uniform(0, 1, (50, 3))
        t = BallTree.euclidean(pts, leaf_size=8)
        p = tmp_path / "ball.npz"
        t.save(p)
        t2 = load_index(p)
        np.testing.assert_array_equal(t.idx, t2.idx)
        np.testing.assert_array_equal(np.asarray(t.nodes.centroids),
                                      np.asarray(t2.nodes.centroids))
        np.testing.assert_array_equal(np.asarray(t.nodes.radii),
                                      np.asarray(t2.nodes.radii))
        assert t2.metric == t.metric
        q = rng.uniform(0, 1, 3)
        i1, d1 = t.query(q, 5)
        i2, d2 = t2.query(q, 5)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(d1, d2)

    def test_reference_sizing_preserved(self, rng, tmp_path):
        pts = rng.uniform(0, 1, (13, 2))
        t = BallTree.euclidean(pts, leaf_size=None)
        p = tmp_path / "b.npz"
        t.save(p)
        t2 = load_index(p)
        assert t2.num_nodes() == t.num_nodes()

    def test_minkowski_metric_round_trip(self, rng, tmp_path):
        pts = rng.uniform(0, 1, (20, 3))
        t = BallTree(pts, Minkowski(3.0), leaf_size=4)
        p = tmp_path / "m.npz"
        t.save(p)
        t2 = load_index(p)
        assert isinstance(t2.metric, Minkowski) and t2.metric.p == 3.0


class TestVantageRoundTrip:
    def test_structure_and_queries(self, rng, tmp_path):
        pts = rng.uniform(0, 1, (40, 4))
        v = VantagePointTree.euclidean(pts)
        p = tmp_path / "vp.npz"
        v.save(p)
        v2 = load_index(p)
        for key in ("vantage_point", "radius", "near", "far"):
            np.testing.assert_array_equal(np.asarray(v.nodes[key]),
                                          np.asarray(v2.nodes[key]))
        assert v2.root == v.root
        q = rng.uniform(0, 1, 4)
        assert v.query_nearest(q) == v2.query_nearest(q)


class TestBruteRoundTrip:
    def test_round_trip(self, rng, tmp_path):
        pts = rng.uniform(0, 1, (30, 3)).astype(np.float32)
        b = BruteForce.euclidean(pts)
        p = tmp_path / "bf.npz"
        b.save(p)
        b2 = load_index(p)
        q = rng.uniform(0, 1, 3).astype(np.float32)
        i1, d1 = b.query(q, 4)
        i2, d2 = b2.query(q, 4)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(d1, d2)


def test_device_built_trees_round_trip(rng, tmp_path):
    """Device-built indexes (level-order VP numbering, device ball build)
    must serialize and reload with identical query results."""
    from petal_neighbors_tpu import BallTree, VantagePointTree, load_index
    from petal_neighbors_tpu.distance import Euclidean
    pts = rng.uniform(0, 1, (120, 3)).astype(np.float32)
    q = rng.uniform(0, 1, 3).astype(np.float32)

    t = BallTree.euclidean(pts, builder="device")
    t.save(tmp_path / "bd.npz")
    t2 = load_index(tmp_path / "bd.npz")
    assert t.query(q, 5)[1].tolist() == t2.query(q, 5)[1].tolist()

    v = VantagePointTree(pts, Euclidean(), builder="device")
    v.save(tmp_path / "vd.npz")
    v2 = load_index(tmp_path / "vd.npz")
    assert v.query_nearest(q) == v2.query_nearest(q)


class TestDynamicRoundTrip:
    def test_pending_mutations_survive(self, rng, tmp_path):
        """Save mid-stream (delta + tombstones pending), reload, and the
        serving state is exact: same live set, same query results, ids
        keep flowing from the same counter."""
        from petal_neighbors_tpu import DynamicIndex, load_index

        pts = rng.uniform(0, 1, (300, 3))
        idx = DynamicIndex(pts, rebuild_threshold=10.0)  # no auto-compact
        added = idx.add(rng.uniform(0, 1, (40, 3)))
        idx.remove([3, 7, int(added[0])])
        p = tmp_path / "dyn.npz"
        idx.save(p)

        back = load_index(p)
        assert back.num_points == idx.num_points
        assert back._next_id == idx._next_id
        assert back._tombstones == idx._tombstones
        np.testing.assert_array_equal(back._base_ids, idx._base_ids)

        qs = rng.uniform(0, 1, (16, 3))
        d0, i0 = idx.query_batch(qs, 7)
        d1, i1 = back.query_batch(qs, 7)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1))
        # radius parity too (mixed base/delta/tombstone path)
        r0 = idx.query_radius(qs[0], 0.4)
        r1 = back.query_radius(qs[0], 0.4)
        np.testing.assert_array_equal(r0, r1)
        # mutation streams continue identically
        a0 = idx.add(qs[1])
        a1 = back.add(qs[1])
        np.testing.assert_array_equal(a0, a1)

    def test_clean_state_round_trip(self, rng, tmp_path):
        from petal_neighbors_tpu import DynamicIndex, load_index

        pts = rng.uniform(0, 1, (64, 2))
        idx = DynamicIndex(pts)
        p = tmp_path / "dyn2.npz"
        idx.save(p)
        back = load_index(p)
        q = rng.uniform(0, 1, 2)
        np.testing.assert_array_equal(idx.query(q, 5)[0],
                                      back.query(q, 5)[0])
