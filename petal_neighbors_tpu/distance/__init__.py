"""Distance metrics (parity with the reference ``src/distance.rs``).

The reference defines a 4-method ``Metric`` trait (distance.rs:9-14):
``distance``, ``rdistance`` (a cheaper monotone surrogate — squared
distance for Euclidean), and the two conversions between them.  The trees
prune in the *distance* domain, but the rdistance duality maps directly to
the TPU's preferred compute shape: the reduced squared distance is one
``‖q‖² + ‖x‖² − 2·q·xᵀ`` MXU matmul; the sqrt happens only at output
boundaries.

Each metric therefore exposes two API tiers:

* **pair tier** (reference trait parity): ``distance(x1, x2)`` /
  ``rdistance`` / ``rdistance_to_distance`` / ``distance_to_rdistance``
  on 1-D vectors;
* **batch tier** (the TPU path): ``rdist(Q, X) -> (q, n)`` reduced
  distances via matmul, ``rowwise_rdist(X, Y) -> (n,)``, plus the same
  conversions applied elementwise.

``pairwise(x, metric)`` replicates distance.rs:58-74: an (n, n) symmetric
matrix with a zero diagonal, zeros for n < 2.
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Metric",
    "Euclidean",
    "SqEuclidean",
    "Cosine",
    "Minkowski",
    "Manhattan",
    "Chebyshev",
    "Haversine",
    "pairwise",
    "get_metric",
    "MATMUL_PRECISION",
]

# Exactness is the product: keep f32 matmuls in true f32 on the MXU
# (pass-count 6 / HIGHEST) rather than bf16x3.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST

# Below this dimension the squared-distance matmul trick is a net loss:
# the MXU pads K to 128 (wasting >= 4x at d <= 32) *and* the
# ||q||^2+||x||^2-2qx form suffers catastrophic cancellation in f32 when
# distances are tiny relative to the norms (measured ~1e-2 relative error
# on 2-D normal data).  The direct (q-x)^2 form on the VPU is both faster
# and exact-to-rounding there.  High-dim callers keep the MXU path and
# rescore top-k candidates with the direct form (ops.bruteforce).
DIRECT_DIM_MAX = 32


class Metric(abc.ABC):
    """Distance-metric interface (reference trait: distance.rs:9-14)."""

    name: str = "metric"

    #: distances depend only on coordinate differences, so data may be
    #: translated (centered) without changing any distance — the numeric
    #: fix for the matmul form's cancellation (see ``pairwise`` and
    #: ``ops.bruteforce.center_of``).
    translation_invariant: bool = False

    #: metric-tree pruning bounds (``max(d(q,c) − r, 0)``,
    #: ball_tree.rs:463-481) require the triangle inequality; metrics that
    #: violate it (e.g. squared Euclidean) are rejected by the tree
    #: constructors and served by ``BruteForce`` only.
    tree_compatible: bool = True

    # -- pair tier (1-D vectors), reference trait parity ------------------
    @abc.abstractmethod
    def distance(self, x1, x2):
        ...

    @abc.abstractmethod
    def rdistance(self, x1, x2):
        ...

    @abc.abstractmethod
    def rdistance_to_distance(self, rd):
        ...

    @abc.abstractmethod
    def distance_to_rdistance(self, d):
        ...

    # -- batch tier (TPU path) --------------------------------------------
    @abc.abstractmethod
    def rdist(self, q, x):
        """Reduced distances between rows of ``q`` (m, d) and ``x`` (n, d),
        returned as an (m, n) matrix."""

    def dist(self, q, x):
        return self.rdistance_to_distance(self.rdist(q, x))

    @abc.abstractmethod
    def rowwise_rdist(self, x, y):
        """Reduced distance between matched rows of ``x`` and ``y`` -> (n,)."""

    def rowwise_dist(self, x, y):
        return self.rdistance_to_distance(self.rowwise_rdist(x, y))

    # Metrics compare equal per class, like the reference's unit structs
    # (``#[derive(Eq, PartialEq)]``, distance.rs:16, :76).
    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash((type(self), tuple(sorted(self.__dict__.items()))))

    def __repr__(self):
        return f"{type(self).__name__}()"

    def validate_dim(self, dim: int) -> None:
        """Hook for metrics with dimensionality requirements (index
        constructors call this before building)."""

    def invalid_queries(self, q):
        """(Q,) bool: query rows whose distance to EVERY point is NaN
        (-> +inf).  Such rows get (+inf, -1) results on all backends —
        the fused kernel's NaN-query policy, mirrored by the XLA paths
        (PARITY.md numeric contract).  Base rule: any NaN coordinate;
        Cosine adds zero-norm rows (0/0 division, distance.rs:93-105)."""
        return jnp.any(jnp.isnan(jnp.asarray(q)), axis=-1)


class Euclidean(Metric):
    """Euclidean metric (distance.rs:16-55).

    ``rdistance`` is the squared distance (no sqrt, distance.rs:37-45);
    the batched path computes it as ``‖q‖² + ‖x‖² − 2 q·xᵀ`` on the MXU
    and clamps tiny negative rounding residue to zero.
    """

    name = "euclidean"
    translation_invariant = True

    def distance(self, x1, x2):
        d = jnp.asarray(x1) - jnp.asarray(x2)
        return jnp.sqrt(jnp.sum(d * d))

    def rdistance(self, x1, x2):
        d = jnp.asarray(x1) - jnp.asarray(x2)
        return jnp.sum(d * d)

    def rdistance_to_distance(self, rd):
        return jnp.sqrt(rd)

    def distance_to_rdistance(self, d):
        return jnp.square(d)

    def rdist(self, q, x):
        q = jnp.asarray(q)
        x = jnp.asarray(x)
        if q.shape[-1] <= DIRECT_DIM_MAX:
            diff = q[:, None, :] - x[None, :, :]
            return jnp.sum(diff * diff, axis=-1)
        qn = jnp.sum(q * q, axis=-1, keepdims=True)          # (m, 1)
        xn = jnp.sum(x * x, axis=-1)                          # (n,)
        cross = jnp.dot(q, x.T, precision=MATMUL_PRECISION)   # (m, n) MXU
        return jnp.maximum(qn + xn[None, :] - 2.0 * cross, 0.0)

    def rdist_with_norms(self, q, x, qn, xn):
        """rdist when ‖·‖² terms are precomputed (index-resident norms)."""
        if q.shape[-1] <= DIRECT_DIM_MAX:
            diff = q[:, None, :] - x[None, :, :]
            return jnp.sum(diff * diff, axis=-1)
        cross = jnp.dot(q, x.T, precision=MATMUL_PRECISION)
        return jnp.maximum(qn[:, None] + xn[None, :] - 2.0 * cross, 0.0)

    def rowwise_rdist(self, x, y):
        d = jnp.asarray(x) - jnp.asarray(y)
        return jnp.sum(d * d, axis=-1)


class SqEuclidean(Euclidean):
    """Squared Euclidean: reported distances stay in the squared
    (rdistance) domain; both conversions are the identity.

    Squared distances violate the triangle inequality, so the metric-tree
    pruning bound ``max(d(q,c) − r, 0)`` over-prunes (``d² − r² =
    (d−r)(d+r) > (d−r)²`` whenever ``d > r``) — tree indexes reject this
    metric; use ``BruteForce`` (which needs no bounds) or ``Euclidean``
    and square the outputs.
    """

    name = "sqeuclidean"
    tree_compatible = False

    def distance(self, x1, x2):
        return self.rdistance(x1, x2)

    def rdistance_to_distance(self, rd):
        return rd

    def distance_to_rdistance(self, d):
        return d


class Cosine(Metric):
    """Cosine distance, ``1 − dot/(‖x1‖·‖x2‖)`` (distance.rs:76-122).

    ``rdistance`` is identical to ``distance`` and both conversions are the
    identity (distance.rs:110-121).  Zero-norm rows produce NaN, exactly as
    the reference's division does; the top-k layer's NaN policy (NaN sorts
    as farthest, CHANGELOG.md:111-115) then applies.
    """

    name = "cosine"

    def distance(self, x1, x2):
        x1 = jnp.asarray(x1)
        x2 = jnp.asarray(x2)
        dot = jnp.sum(x1 * x2)
        n1 = jnp.sqrt(jnp.sum(x1 * x1))
        n2 = jnp.sqrt(jnp.sum(x2 * x2))
        return 1.0 - dot / (n1 * n2)

    def rdistance(self, x1, x2):
        return self.distance(x1, x2)

    def rdistance_to_distance(self, rd):
        return rd

    def distance_to_rdistance(self, d):
        return d

    def rdist(self, q, x):
        q = jnp.asarray(q)
        x = jnp.asarray(x)
        dot = jnp.dot(q, x.T, precision=MATMUL_PRECISION)
        qn = jnp.sqrt(jnp.sum(q * q, axis=-1))[:, None]
        xn = jnp.sqrt(jnp.sum(x * x, axis=-1))[None, :]
        return 1.0 - dot / (qn * xn)

    def rowwise_rdist(self, x, y):
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        dot = jnp.sum(x * y, axis=-1)
        nx = jnp.sqrt(jnp.sum(x * x, axis=-1))
        ny = jnp.sqrt(jnp.sum(y * y, axis=-1))
        return 1.0 - dot / (nx * ny)

    def invalid_queries(self, q):
        # zero-norm queries divide 0/0 -> NaN against every point; same
        # (+inf, -1) policy as the kernel path's normalize-to-NaN
        q = jnp.asarray(q)
        return (jnp.any(jnp.isnan(q), axis=-1)
                | (jnp.sum(q * q, axis=-1) == 0.0))


class Minkowski(Metric):
    """Minkowski L_p metric (extension beyond the reference; BASELINE.md
    config #5 exercises the generic metric path at high dimension).

    ``rdistance`` is the p-th-power sum (monotone surrogate, analogous to
    the Euclidean squared distance).

    Integral ``p`` takes a multiply-chain fast path
    (``lax.integer_pow``): the generic ``x ** p`` lowers to the
    transcendental ``exp(p·log x)`` on the VPU, which dominated the
    high-dim batch path (measured ~7x slower than Euclidean at 960-d);
    ``|d|^3 = |d|·d·d`` is three cheap multiplies, and even powers skip
    the ``abs`` entirely.
    """

    name = "minkowski"
    translation_invariant = True

    def __init__(self, p: float = 2.0):
        if not p >= 1.0:
            raise ValueError("Minkowski requires p >= 1")
        self.p = float(p)
        self._p_int = int(p) if float(p).is_integer() and p <= 64 else None

    def _pow_sum(self, diff, axis=None):
        """sum(|diff| ** p) with the integer-p multiply-chain fast path."""
        if self._p_int is not None:
            base = diff if self._p_int % 2 == 0 else jnp.abs(diff)
            return jnp.sum(jax.lax.integer_pow(base, self._p_int), axis=axis)
        return jnp.sum(jnp.abs(diff) ** self.p, axis=axis)

    def distance(self, x1, x2):
        return self.rdistance(x1, x2) ** (1.0 / self.p)

    def rdistance(self, x1, x2):
        return self._pow_sum(jnp.asarray(x1) - jnp.asarray(x2))

    def rdistance_to_distance(self, rd):
        return rd ** (1.0 / self.p)

    def distance_to_rdistance(self, d):
        return d ** self.p

    def rdist(self, q, x):
        q = jnp.asarray(q)
        x = jnp.asarray(x)
        return self._pow_sum(q[:, None, :] - x[None, :, :], axis=-1)

    def rowwise_rdist(self, x, y):
        return self._pow_sum(jnp.asarray(x) - jnp.asarray(y), axis=-1)

    def __repr__(self):
        return f"Minkowski(p={self.p})"


class Manhattan(Minkowski):
    """L1 / city-block metric (= Minkowski p=1, specialized: no pow)."""

    name = "manhattan"

    def __init__(self):
        super().__init__(1.0)

    def rdistance(self, x1, x2):
        return jnp.sum(jnp.abs(jnp.asarray(x1) - jnp.asarray(x2)))

    def rdist(self, q, x):
        return jnp.sum(jnp.abs(jnp.asarray(q)[:, None, :]
                               - jnp.asarray(x)[None, :, :]), axis=-1)

    def rowwise_rdist(self, x, y):
        return jnp.sum(jnp.abs(jnp.asarray(x) - jnp.asarray(y)), axis=-1)

    def rdistance_to_distance(self, rd):
        return rd

    def distance_to_rdistance(self, d):
        return d

    def __repr__(self):
        return "Manhattan()"


class Chebyshev(Metric):
    """L-infinity metric: max coordinate difference."""

    name = "chebyshev"
    translation_invariant = True

    def distance(self, x1, x2):
        return jnp.max(jnp.abs(jnp.asarray(x1) - jnp.asarray(x2)))

    def rdistance(self, x1, x2):
        return self.distance(x1, x2)

    def rdistance_to_distance(self, rd):
        return rd

    def distance_to_rdistance(self, d):
        return d

    def rdist(self, q, x):
        return jnp.max(jnp.abs(jnp.asarray(q)[:, None, :]
                               - jnp.asarray(x)[None, :, :]), axis=-1)

    def rowwise_rdist(self, x, y):
        return jnp.max(jnp.abs(jnp.asarray(x) - jnp.asarray(y)), axis=-1)


class Haversine(Metric):
    """Great-circle distance on the unit sphere for (lat, lon) in radians
    (multiply results by the sphere radius for physical units).

    rdistance is the haversine value ``sin^2(dlat/2) +
    cos(lat1) cos(lat2) sin^2(dlon/2)`` — a monotone surrogate, the same
    duality the Euclidean squared distance provides.
    Note: ball-tree pruning uses arithmetic-mean centroids like the
    reference does for every metric; bounds remain valid because node
    radii are computed with this metric (ball_tree.rs:458-460).
    """

    name = "haversine"

    def validate_dim(self, dim: int) -> None:
        if dim != 2:
            raise ValueError(
                f"haversine requires (lat, lon) pairs: got dim {dim}, "
                "expected 2")

    @staticmethod
    def _check_dim(x):
        if x.shape[-1] != 2:
            raise ValueError(
                f"haversine requires (lat, lon) pairs: got dim "
                f"{x.shape[-1]}, expected 2")
        return x

    def _hav(self, lat1, lon1, lat2, lon2):
        dlat = lat2 - lat1
        dlon = lon2 - lon1
        return (jnp.sin(dlat / 2) ** 2
                + jnp.cos(lat1) * jnp.cos(lat2) * jnp.sin(dlon / 2) ** 2)

    def distance(self, x1, x2):
        return self.rdistance_to_distance(self.rdistance(x1, x2))

    def rdistance(self, x1, x2):
        x1 = self._check_dim(jnp.asarray(x1))
        x2 = self._check_dim(jnp.asarray(x2))
        return self._hav(x1[0], x1[1], x2[0], x2[1])

    def rdistance_to_distance(self, rd):
        return 2.0 * jnp.arcsin(jnp.sqrt(jnp.clip(rd, 0.0, 1.0)))

    def distance_to_rdistance(self, d):
        return jnp.sin(d / 2.0) ** 2

    def rdist(self, q, x):
        q = self._check_dim(jnp.asarray(q))
        x = self._check_dim(jnp.asarray(x))
        return self._hav(q[:, None, 0], q[:, None, 1],
                         x[None, :, 0], x[None, :, 1])

    def rowwise_rdist(self, x, y):
        x = self._check_dim(jnp.asarray(x))
        y = self._check_dim(jnp.asarray(y))
        return self._hav(x[..., 0], x[..., 1], y[..., 0], y[..., 1])


def pairwise(x, metric: Metric | None = None):
    """Symmetric (n, n) distance matrix (distance.rs:58-74).

    The reference computes the strict upper triangle and mirrors it,
    leaving the diagonal zero; n < 2 returns all zeros.  Here the whole
    matrix comes from one MXU matmul and is then exactly symmetrized the
    same way (upper triangle mirrored) so ``D[i,j] == D[j,i]`` bit-for-bit
    and ``D[i,i] == 0``.

    Translation-invariant metrics are centered first (``x − nanmean(x)``):
    the ``‖a‖²+‖b‖²−2abᵀ`` matmul form's absolute error scales with
    ``eps·‖x‖²``, so un-centered data (e.g. a feature matrix with mean
    100) yields relative errors of several hundred percent; centering
    shrinks the norms to data-variance scale without changing any
    distance (same scheme as ``ops.bruteforce.center_of``).
    """
    metric = metric or Euclidean()
    x = jnp.asarray(x)
    n = x.shape[0]
    if n < 2:
        return jnp.zeros((n, n), dtype=x.dtype)
    if metric.translation_invariant:
        x = x - jnp.nan_to_num(jnp.nanmean(x, axis=0))
    d = metric.rdistance_to_distance(metric.rdist(x, x))
    upper = jnp.triu(d, k=1)
    return upper + upper.T


_REGISTRY = {
    "euclidean": Euclidean,
    "sqeuclidean": SqEuclidean,
    "cosine": Cosine,
    "minkowski": Minkowski,
    "manhattan": Manhattan,
    "cityblock": Manhattan,
    "l1": Manhattan,
    "chebyshev": Chebyshev,
    "linf": Chebyshev,
    "haversine": Haversine,
}


def get_metric(name_or_metric, **kwargs) -> Metric:
    """Resolve a metric by instance or registry name."""
    if isinstance(name_or_metric, Metric):
        return name_or_metric
    try:
        cls = _REGISTRY[str(name_or_metric).lower()]
    except KeyError:
        raise ValueError(
            f"unknown metric {name_or_metric!r}; known: {sorted(_REGISTRY)}"
        ) from None
    return cls(**kwargs)
