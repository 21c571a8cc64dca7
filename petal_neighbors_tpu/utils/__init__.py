"""Host-side utilities: validation, static tree geometry."""

from .tree_math import TreeShape, tree_shape
from .validation import check_points, check_query, check_query_batch

__all__ = [
    "TreeShape",
    "tree_shape",
    "check_points",
    "check_query",
    "check_query_batch",
]
