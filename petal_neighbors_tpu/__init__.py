"""petal_neighbors_tpu — a TPU-native exact nearest-neighbor engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``petal-neighbors`` Rust crate (ball tree + vantage-point tree + distance
metrics, reference at /root/reference): all distance evaluation collapses
onto tiled ``‖q‖²+‖x‖²−2q·xᵀ`` MXU matmuls, indexes are flat SoA arrays
built level-synchronously, queries run as batched lockstep traversals, and
datasets larger than one chip scale over a ``jax.sharding.Mesh``.

Public surface (crate-root parity, lib.rs:1-16):
  * ``BallTree``, ``VantagePointTree`` — metric-tree indexes
  * ``distance`` module — ``Metric``, ``Euclidean``, ``Cosine``, ``pairwise``
  * ``ArrayError`` (+ ``EmptyArrayError``, ``NotContiguousError``)
plus TPU-native extensions: ``BruteForce``, batched queries, sharded
multi-chip search (``petal_neighbors_tpu.parallel``).
"""

from . import cluster, distance
from .cluster import hdbscan
from .distance import (Chebyshev, Cosine, Euclidean, Haversine, Manhattan,
                       Metric, Minkowski, SqEuclidean, pairwise)
from .errors import ArrayError, EmptyArrayError, NotContiguousError
from .trees import (BallTree, BruteForce, DynamicIndex, VantagePointTree,
                    boruvka_mst, mutual_reachability_mst,
                    dual_tree_knn)
from .sklearn import NearestNeighbors
from .utils.serialize import load_index, save_index
from .utils.serving import AsyncResult, QueryStream

__version__ = "0.1.0"

__all__ = [
    "AsyncResult",
    "QueryStream",
    "boruvka_mst",
    "cluster",
    "hdbscan",
    "mutual_reachability_mst",
    "NearestNeighbors",
    "distance",
    "Metric",
    "Euclidean",
    "SqEuclidean",
    "Cosine",
    "Minkowski",
    "Manhattan",
    "Chebyshev",
    "Haversine",
    "pairwise",
    "ArrayError",
    "EmptyArrayError",
    "NotContiguousError",
    "BallTree",
    "VantagePointTree",
    "BruteForce",
    "DynamicIndex",
    "dual_tree_knn",
    "save_index",
    "load_index",
]
