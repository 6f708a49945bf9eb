"""Exact cdf / quantile over raw samples — the test-time ground truth.

Vectorized equivalents of the reference oracle
``/root/reference/core/src/main/java/com/tdunning/math/stats/Dist.java:27-75``:

* ``cdf(x, data)``      = (#{v < x} + #{v == x}/2) / n
* ``quantile(q, data)`` = sorted_data[floor(clip(q*n, 0, n-1))]

Used by the pytest layers and by the small-scale ``exact_quantiles`` operator.
"""

from __future__ import annotations

import numpy as np


def exact_cdf(xs, sorted_data: np.ndarray) -> np.ndarray:
    """Exact mid-rank cdf of each probe in ``xs`` (Dist.java:27-34)."""
    sorted_data = np.asarray(sorted_data, dtype=np.float64)
    xs = np.atleast_1d(np.asarray(xs, dtype=np.float64))
    n = sorted_data.size
    lo = np.searchsorted(sorted_data, xs, side="left")
    hi = np.searchsorted(sorted_data, xs, side="right")
    return (lo + (hi - lo) / 2.0) / n


def exact_quantile(qs, sorted_data: np.ndarray) -> np.ndarray:
    """Exact lower-index quantile of each q in ``qs`` (Dist.java:47-60)."""
    sorted_data = np.asarray(sorted_data, dtype=np.float64)
    qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
    n = sorted_data.size
    if n == 0:
        return np.full(qs.shape, np.nan)
    idx = np.clip(np.floor(qs * n), 0, n - 1).astype(np.int64)
    return sorted_data[idx]
