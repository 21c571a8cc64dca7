"""L0 compute kernels: tiled distances, top-k, brute-force exact search."""

from .topk import merge_topk, nan_to_inf, smallest_k
from .bruteforce import compact_mask, knn, radius_counts, radius_mask

__all__ = [
    "merge_topk",
    "nan_to_inf",
    "smallest_k",
    "knn",
    "radius_mask",
    "radius_counts",
    "compact_mask",
]
