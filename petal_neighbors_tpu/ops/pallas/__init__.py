"""Pallas TPU kernels for the hot paths.

Import is lazy/guarded: these kernels require a TPU backend (or Pallas
interpret mode); all callers fall back to the XLA-level implementations
when unavailable.
"""
