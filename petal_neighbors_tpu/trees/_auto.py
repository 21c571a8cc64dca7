"""Shared builder auto-selection policy."""

from __future__ import annotations

# Crossover where the on-device level-synchronous builds beat the host
# builders (measured: ball 43x / VP 12x at 1M; host wins below ~100k
# because eager transfers + compile amortization dominate).
DEVICE_BUILD_MIN_N = 131072


def use_device_build(n: int) -> bool:
    """True when the level-synchronous on-device builder should be used:
    a large corpus AND an accelerator default backend (the builders are
    plain XLA — the Pallas availability probe doubles as the
    'accelerator present' check)."""
    from ..ops.pallas.knn_kernel import pallas_available

    return n >= DEVICE_BUILD_MIN_N and pallas_available()
