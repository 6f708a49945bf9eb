"""KMV (k-minimum-values / bottom-k Theta) distinct sketch.

The classic KMV estimator (Beyer et al., SIGMOD 2007; the Theta sketch
family): keep the k smallest 64-bit hash values of the stream. With
v_k = k-th smallest hash mapped to (0,1], the distinct estimate is
``(k-1) / v_k`` (unbiased), relative standard error ``1/sqrt(k-2)``.
Below k distinct values the sketch is EXACT (it holds every distinct
hash).

Why alongside HLL: the retained sample supports UNBIASED set operations
— Jaccard / intersection via the bottom-k of the union (Theta's trick) —
where HLL inclusion-exclusion compounds error. Merge = union of mins,
associative/commutative, so it rides the standard sketch_by_key plumbing
(`Sketch` protocol: update_batch / merge / to_bytes / from_bytes).
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.hashing import hash64

_SCALE = 2.0 ** 64


class KmvSketch:
    """Bottom-k distinct sketch over 64-bit hashes."""

    __slots__ = ("k", "mins")

    def __init__(self, k: int = 1024):
        if k < 8:
            raise ValueError(f"k must be >= 8, got {k}")
        self.k = int(k)
        self.mins = np.empty(0, dtype=np.uint64)  # sorted, distinct

    # ------------------------------------------------------------ updates

    def update_batch(self, values, weights=None) -> None:
        h = hash64(np.asarray(values))
        self.mins = np.unique(np.concatenate([self.mins, h]))[:self.k]

    def merge(self, *others: "KmvSketch") -> "KmvSketch":
        arrs = [self.mins] + [o.mins for o in others]
        self.mins = np.unique(np.concatenate(arrs))[:self.k]
        return self

    # ------------------------------------------------------------ queries

    @property
    def is_exact(self) -> bool:
        return len(self.mins) < self.k

    def distinct_estimate(self) -> float:
        m = len(self.mins)
        if m < self.k:
            return float(m)  # exact below saturation
        v_k = (float(self.mins[self.k - 1]) + 1.0) / _SCALE
        return (self.k - 1) / v_k

    def rse(self) -> float:
        """Published relative standard error (Beyer et al. 2007)."""
        return 1.0 / np.sqrt(self.k - 2)

    def jaccard(self, other: "KmvSketch") -> float:
        """Unbiased Jaccard estimate via the bottom-k of the union
        (Theta-sketch set semantics): among the union's k smallest
        hashes, the fraction present in BOTH sketches."""
        union = np.unique(np.concatenate([self.mins, other.mins]))
        union = union[:min(self.k, other.k)]
        if not len(union):
            return 0.0
        both = (np.isin(union, self.mins) & np.isin(union, other.mins))
        return float(both.sum()) / float(len(union))

    def intersection_estimate(self, other: "KmvSketch") -> float:
        """|A ∩ B| ≈ jaccard * |A ∪ B| (union estimated from the merged
        bottom-k)."""
        u = KmvSketch(min(self.k, other.k))
        u.mins = np.unique(np.concatenate([self.mins,
                                           other.mins]))[:u.k]
        return self.jaccard(other) * u.distinct_estimate()

    def difference_estimate(self, other: "KmvSketch") -> float:
        """Theta-style A-not-B: |A \\ B| (the DataSketches ``AnotB``
        operation). The union's k-th smallest hash is the sampling
        threshold theta; every distinct item of A∪B below theta is an
        independent inclusion-prob-theta sample, so
        ``#(in A, not in B, below theta) / theta`` is unbiased. Uses the
        k-1 strictly-below-threshold elements with ``theta = v_k`` so the
        three cells (A∩B, A\\B, B\\A) sum exactly to the union's
        ``(k-1)/v_k`` estimate. Exact when neither sketch is saturated."""
        k = min(self.k, other.k)
        union = np.unique(np.concatenate([self.mins, other.mins]))
        if len(union) < k:  # exhaustive sample -> exact
            only = np.isin(self.mins, other.mins, invert=True)
            return float(only.sum())
        theta = (float(union[k - 1]) + 1.0) / _SCALE
        head = union[:k - 1]
        cnt = int((np.isin(head, self.mins)
                   & np.isin(head, other.mins, invert=True)).sum())
        return cnt / theta

    # ------------------------------------------------------------- serde

    def to_bytes(self) -> bytes:
        return (struct.pack("<II", self.k, len(self.mins))
                + self.mins.tobytes())

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KmvSketch":
        k, m = struct.unpack_from("<II", buf, 0)
        out = cls(k)
        out.mins = np.frombuffer(buf, dtype=np.uint64, count=m,
                                 offset=8).copy()
        return out
