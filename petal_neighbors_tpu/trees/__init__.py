"""Index layer: flat SoA tree structures and the brute-force exact index."""

from .bruteforce import BruteForce

__all__ = ["BruteForce"]
