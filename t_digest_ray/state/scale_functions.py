"""Scale functions for the t-digest.

A scale function maps quantiles ``q in [0, 1]`` to a "k-index" whose unit
spacing defines the maximum cluster sizes of a t-digest: a centroid covering
quantile range ``[q0, q1]`` is legal iff ``k(q1) - k(q0) <= 1``.  The core
variants (semantics per the reference implementation,
``/root/reference/core/src/main/java/com/tdunning/math/stats/ScaleFunction.java``):

* ``K_0``  (ScaleFunction.java:34)  — uniform cluster sizes, constant accuracy.
* ``K_1``  (ScaleFunction.java:75)  — arcsine scale; error ~ sqrt(q(1-q)).
* ``K_2``  (ScaleFunction.java:300) — log-odds scale; cluster size ~ q(1-q),
  with normalizer ``Z(c, n) = 4 ln(n/c) + 24`` (ScaleFunction.java:360).
* ``K_3``  (ScaleFunction.java:462) — log scale; cluster size ~ min(q, 1-q),
  with ``Z(c, n) = 4 ln(n/c) + 21``.

Each provides four operations used by the merge kernel and invariant checks:

* ``k(q, normalizer)``        — quantile → k-index
* ``q(k, normalizer)``        — k-index → quantile (inverse)
* ``max_size(q, normalizer)`` — max *relative* cluster weight at quantile q
* ``normalizer(compression, n)``

All are vectorized over numpy arrays (scalar floats also accepted).  Inputs
to ``k`` are clamped to ``[1e-15, 1 - 1e-15]`` exactly like the reference's
``limitCall`` guard (ScaleFunction.java:926-940).
"""

from __future__ import annotations

import math

import numpy as np

_EPS = 1e-15


def _clip_q(q):
    return np.clip(q, _EPS, 1.0 - _EPS)


class ScaleFunction:
    """Base interface; subclasses are stateless singletons."""

    name: str = "base"

    def k(self, q, normalizer):
        raise NotImplementedError

    def q(self, k, normalizer):
        raise NotImplementedError

    # scalar fast paths (math module beats numpy by ~20x on scalars); used in
    # the merge kernel's per-centroid emit loop
    def k_scalar(self, q: float, normalizer: float) -> float:
        return float(self.k(q, normalizer))

    def q_scalar(self, k: float, normalizer: float) -> float:
        return float(self.q(k, normalizer))

    def max_size(self, q, normalizer):
        """Maximum relative cluster weight at quantile q (ScaleFunction.java:831-850)."""
        raise NotImplementedError

    def normalizer(self, compression: float, n: float) -> float:
        raise NotImplementedError

    def __repr__(self):  # pragma: no cover
        return self.name


class K0(ScaleFunction):
    """Uniform cluster sizes: k(q) = normalizer * q, normalizer = c/2."""

    name = "K_0"

    def k(self, q, normalizer):
        return np.multiply(normalizer, q)

    def q(self, k, normalizer):
        return np.divide(k, normalizer)

    def max_size(self, q, normalizer):
        return np.broadcast_to(np.float64(1.0 / normalizer), np.shape(q)).copy() \
            if np.ndim(q) else 1.0 / normalizer

    def k_scalar(self, q, normalizer):
        return normalizer * q

    def q_scalar(self, k, normalizer):
        return k / normalizer

    def normalizer(self, compression, n):
        return compression / 2.0


class K1(ScaleFunction):
    """Arcsine scale: k(q) = normalizer * asin(2q - 1), normalizer = c/(2*pi)."""

    name = "K_1"

    def k(self, q, normalizer):
        return normalizer * np.arcsin(2.0 * _clip_q(q) - 1.0)

    def q(self, k, normalizer):
        x = np.clip(np.divide(k, normalizer), -np.pi / 2, np.pi / 2)
        return (np.sin(x) + 1.0) / 2.0

    def max_size(self, q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        out = 2.0 * np.sin(0.5 / normalizer) * np.sqrt(np.maximum(q * (1.0 - q), 0.0))
        # hard zero at the boundaries (ScaleFunction.java:134-141)
        out = np.where((q <= 0.0) | (q >= 1.0), 0.0, out)
        return out if out.ndim else float(out)

    def k_scalar(self, q, normalizer):
        q = min(max(q, _EPS), 1.0 - _EPS)
        return normalizer * math.asin(2.0 * q - 1.0)

    def q_scalar(self, k, normalizer):
        x = min(max(k / normalizer, -math.pi / 2), math.pi / 2)
        return (math.sin(x) + 1.0) / 2.0

    def normalizer(self, compression, n):
        return compression / (2.0 * np.pi)


class K2(ScaleFunction):
    """Log-odds scale: k(q) = normalizer * ln(q/(1-q)).

    normalizer = c / Z(c, n) with Z = 4 ln(n/c) + 24 (ScaleFunction.java:355-361).
    Cluster sizes are proportional to q(1-q) -> strictly bounded centroid count.
    """

    name = "K_2"

    def k(self, q, normalizer):
        qc = _clip_q(q)
        return normalizer * np.log(qc / (1.0 - qc))

    def q(self, k, normalizer):
        w = np.exp(np.divide(k, normalizer))
        return w / (1.0 + w)

    def max_size(self, q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        out = np.maximum(q * (1.0 - q), 0.0) / normalizer
        return out if out.ndim else float(out)

    def k_scalar(self, q, normalizer):
        q = min(max(q, _EPS), 1.0 - _EPS)
        return normalizer * math.log(q / (1.0 - q))

    def q_scalar(self, k, normalizer):
        w = math.exp(k / normalizer)
        return w / (1.0 + w)

    def normalizer(self, compression, n):
        return compression / self.z(compression, n)

    @staticmethod
    def z(compression, n):
        return 4.0 * math.log(max(n, 1.0) / compression) + 24.0


class K3(ScaleFunction):
    """Log scale: k(q) = normalizer * ln(2q) for q<=0.5, odd-symmetric above.

    Cluster sizes ~ min(q, 1-q); Z = 4 ln(n/c) + 21 (ScaleFunction.java:462-528).
    """

    name = "K_3"

    def k(self, q, normalizer):
        qc = _clip_q(np.asarray(q, dtype=np.float64))
        lo = np.log(2.0 * np.minimum(qc, 1.0 - qc)) * normalizer
        out = np.where(qc <= 0.5, lo, -lo)
        return out if out.ndim else float(out)

    def q(self, k, normalizer):
        k = np.asarray(k, dtype=np.float64)
        lo = np.exp(-np.abs(k) / normalizer) / 2.0
        out = np.where(k <= 0, lo, 1.0 - lo)
        return out if out.ndim else float(out)

    def max_size(self, q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        out = np.maximum(np.minimum(q, 1.0 - q), 0.0) / normalizer
        return out if out.ndim else float(out)

    def k_scalar(self, q, normalizer):
        q = min(max(q, _EPS), 1.0 - _EPS)
        if q <= 0.5:
            return normalizer * math.log(2.0 * q)
        return -normalizer * math.log(2.0 * (1.0 - q))

    def q_scalar(self, k, normalizer):
        lo = math.exp(-abs(k) / normalizer) / 2.0
        return lo if k <= 0 else 1.0 - lo

    def normalizer(self, compression, n):
        return compression / self.z(compression, n)

    @staticmethod
    def z(compression, n):
        return 4.0 * math.log(max(n, 1.0) / compression) + 21.0


K_0 = K0()
K_1 = K1()
K_2 = K2()
K_3 = K3()

SCALE_FUNCTIONS: dict[str, ScaleFunction] = {
    s.name: s for s in (K_0, K_1, K_2, K_3)
}
# numeric codes used by the serialized digest header
SCALE_CODES: dict[str, int] = {"K_0": 0, "K_1": 1, "K_2": 2, "K_3": 3}
SCALE_FROM_CODE: dict[int, ScaleFunction] = {
    SCALE_CODES[name]: fn for name, fn in SCALE_FUNCTIONS.items()
}


def get_scale(name_or_fn) -> ScaleFunction:
    if isinstance(name_or_fn, ScaleFunction):
        return name_or_fn
    return SCALE_FUNCTIONS[str(name_or_fn)]
