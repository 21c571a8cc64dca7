"""Index layer: flat SoA tree structures and the brute-force exact index."""

from .ball import BallTree, Node, NodeTable
from .bruteforce import BruteForce
from .boruvka import boruvka_mst, mutual_reachability_mst
from .dual import dual_tree_knn
from .dynamic import DynamicIndex
from .vantage import VantagePointTree

__all__ = ["BallTree", "Node", "NodeTable", "BruteForce", "DynamicIndex",
           "boruvka_mst", "mutual_reachability_mst",
           "VantagePointTree", "dual_tree_knn"]
