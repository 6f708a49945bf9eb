"""Deterministic vectorized 64-bit hashing.

All hashes are stable across processes, runs and parallelism levels (no
PYTHONHASHSEED dependence) — required for retry determinism and for the
"identical result at any parallelism" invariant (SURVEY.md §4).

* ``hash64(values)``      — uint64 hash of a string/binary/int array
  (pandas ``hash_array``, a seeded SipHash-like C implementation).
* ``splitmix64(x)``       — fast uint64 mixer (public-domain constants from
  Steele et al., "Fast Splittable Pseudorandom Number Generators", used by
  java.util.SplittableRandom and xorshift-family generators).
* ``hash_i(h, i)``        — derive the i-th hash from one base hash by
  double hashing: ``h1 + i * h2`` with h2 odd (Kirsch & Mitzenmacher,
  "Less Hashing, Same Performance", ESA 2006) — powers Bloom / count-min.
* ``uniform01(h)``        — map uint64 -> float64 in [0, 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64."""
    with np.errstate(over="ignore"):
        z = (np.asarray(x).astype(np.uint64) + _GOLDEN)
        z = (z ^ (z >> np.uint64(30))) * _MIX1
        z = (z ^ (z >> np.uint64(27))) * _MIX2
        return z ^ (z >> np.uint64(31))


def hash64(values, seed: int = 0) -> np.ndarray:
    """Stable uint64 hash of an array of strings / bytes / ints."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        h = splitmix64(arr.astype(np.uint64))
    else:
        # pandas hash_array: stable, vectorized (C) for object arrays
        h = pd.util.hash_array(arr.astype(object), categorize=False)
    if seed:
        with np.errstate(over="ignore"):
            h = splitmix64(h ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    return h.astype(np.uint64)


def hash_i(h: np.ndarray, i: int) -> np.ndarray:
    """i-th derived hash via double hashing (h1 + i*h2, h2 forced odd)."""
    h = np.asarray(h, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h2 = splitmix64(h) | np.uint64(1)
        return h + np.uint64(i) * h2


def uniform01(h) -> np.ndarray:
    """uint64 -> float64 uniform in [0, 1) using the top 53 bits."""
    h = np.asarray(h, dtype=np.uint64)
    return (h >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)
