"""Multi-chip scaling (L5): sharded exact search over a ``jax.sharding.Mesh``.

The reference is single-threaded and single-address-space; its only
concurrency affordance is ``Sync`` metrics + ``&self`` queries so *callers*
may fan out (SURVEY.md §2.7).  Here distribution is first-class and rides
XLA collectives over ICI:

* **query data-parallelism** — queries sharded over a mesh axis, index
  replicated: embarrassingly parallel, one ``all_gather``-free pass.
* **point sharding** — points row-sharded, queries replicated: each device
  computes a local exact top-k, then the k-lists are ``all_gather``-ed and
  merged (k-way merge is associative and exact).
* **ring search** — both sharded: point shards rotate around the ring via
  ``ppermute`` while each device keeps a running top-k for its resident
  query shard.  After P hops every query has seen every point — the exact
  analogue of ring attention for k-NN, for datasets larger than one
  chip's HBM (SURVEY.md §2.7 SP row).
"""

from .api import (
    default_mesh,
    init_distributed,
    knn_feature_sharded,
    knn_points_sharded,
    knn_query_sharded,
    knn_ring,
    mutual_reachability_mst_sharded,
    radius_points_sharded,
    radius_query_sharded,
    tree_query_sharded,
)

__all__ = [
    "default_mesh",
    "init_distributed",
    "knn_query_sharded",
    "knn_points_sharded",
    "knn_feature_sharded",
    "knn_ring",
    "tree_query_sharded",
    "radius_query_sharded",
    "radius_points_sharded",
    "mutual_reachability_mst_sharded",
]
