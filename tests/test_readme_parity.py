"""The reference README / doctest examples, verbatim semantics
(README.md:13-21; ball_tree.rs:69-78, :93-100, :128-135;
vantage_point_tree.rs:78-87)."""

import numpy as np
import pytest

from petal_neighbors_tpu import BallTree, VantagePointTree


def test_readme_example():
    """README.md:13-21: two nearest neighbors in a ball tree."""
    points = np.array([[1.0, 1.0], [1.0, 2.0], [9.0, 9.0]])
    tree = BallTree.euclidean(points)
    indices, distances = tree.query(np.array([3.0, 3.0]), 2)
    np.testing.assert_array_equal(indices, [1, 0])


def test_balltree_query_nearest_doctest():
    """ball_tree.rs:69-78."""
    points = np.array([[1.0, 1.0], [1.0, 2.0], [9.0, 9.0]])
    tree = BallTree.euclidean(points)
    index, distance = tree.query_nearest(np.array([8.0, 8.0]))
    assert index == 2
    assert abs(np.sqrt(2.0) - distance) < 1e-8


def test_balltree_query_radius_doctest():
    """ball_tree.rs:128-135."""
    points = np.array([[1.0, 0.0], [2.0, 0.0], [9.0, 0.0]])
    tree = BallTree.euclidean(points)
    indices = tree.query_radius(np.array([3.0, 0.0]), 1.5)
    np.testing.assert_array_equal(sorted(indices.tolist()), [1])


def test_vantage_doctest():
    """vantage_point_tree.rs:78-87."""
    points = np.array([[1.0, 1.0], [1.0, 2.0], [9.0, 9.0]])
    tree = VantagePointTree.euclidean(points)
    index, distance = tree.query_nearest(np.array([8.0, 8.0]))
    assert index == 2
    assert abs(np.sqrt(2.0) - distance) < 1e-8
