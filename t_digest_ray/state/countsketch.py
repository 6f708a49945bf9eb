"""Count-Sketch (AMS-style signed frequency sketch).

Built from the published algorithm (Charikar, Chen, Farach-Colton,
"Finding frequent items in data streams", ICALP 2002). Not in the
reference repo — it rounds out the frequency family next to the count-min
sketch (state/countmin.py) with two properties CMS lacks:

* **Unbiased** point estimates: E[est] = true frequency (CMS only
  guarantees est >= true). The estimate is the MEDIAN over ``depth``
  rows of ``sign_i(x) * C[i, h_i(x)]``.
* Error scales with the stream's **L2** mass, not L1: with width w,
  ``|est - f(x)| <= 3 * sqrt(F2_res / w)`` per row with prob >= 8/9
  (paper Lemma 4; F2_res = second moment of the OTHER keys), driven to
  ``1 - delta`` by the median over ``depth = O(log 1/delta)`` rows —
  much tighter than eps*N on skewed (Zipfian) key distributions.

Same distributed contract as every sketch here (protocol.py): vectorized
``update_batch`` (one base hash, row positions and signs derived by
double hashing), elementwise-add ``merge`` (associative, commutative,
exact), stable byte serde. Signed counters also estimate inner products
(join sizes) unbiasedly via row-wise dot products.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..functions.hashing import hash64, hash_i

_HEADER_FMT = "<4sii"
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)


class CountSketch:
    def __init__(self, width: int = 2048, depth: int = 5):
        if width < 8 or depth < 1 or depth > 16:
            raise ValueError(f"bad CountSketch shape ({width}, {depth})")
        self.width = int(width)
        self.depth = int(depth)
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.n = 0  # total added weight (L1 of updates)

    @classmethod
    def from_error(cls, rel_l2: float, delta: float) -> "CountSketch":
        """Size so that |est - f| <= rel_l2 * sqrt(F2) w.p. 1 - delta."""
        return cls(width=int(math.ceil(9.0 / rel_l2 ** 2)),
                   depth=int(math.ceil(4.0 * math.log(1.0 / delta))))

    def _pos_sign(self, values) -> tuple[np.ndarray, np.ndarray]:
        """Per row i: position h_i(x) in [0, width) and sign g_i(x) ±1,
        both derived from one base hash by double hashing — position from
        the low bits, sign from bit 62 (independent enough per the
        Kirsch-Mitzenmacher construction used across this library)."""
        h = hash64(np.asarray(values))
        pos = np.empty((self.depth, h.size), dtype=np.int64)
        sign = np.empty((self.depth, h.size), dtype=np.int64)
        for i in range(self.depth):
            hi = hash_i(h, 2 * i + 1)
            pos[i] = (hi % np.uint64(self.width)).astype(np.int64)
            sign[i] = 1 - 2 * ((hi >> np.uint64(62))
                               & np.uint64(1)).astype(np.int64)
        return pos, sign

    def update_batch(self, values, weights=None) -> None:
        arr = np.asarray(values)
        if arr.size == 0:
            return
        w = (np.ones(arr.size, dtype=np.int64) if weights is None
             else np.asarray(weights).astype(np.int64))
        pos, sign = self._pos_sign(arr)
        for i in range(self.depth):
            np.add.at(self.table[i], pos[i], sign[i] * w)
        self.n += int(w.sum())

    def estimate(self, values) -> np.ndarray:
        """Vectorized unbiased point-frequency estimates (median of
        signed row counters)."""
        arr = np.atleast_1d(np.asarray(values))
        if arr.size == 0:
            return np.empty(0, dtype=np.int64)
        pos, sign = self._pos_sign(arr)
        ests = np.stack([sign[i] * self.table[i][pos[i]]
                         for i in range(self.depth)])
        # median of an even row count averages the middle two — keep it
        # integral (counts are integers) with a floor toward zero
        med = np.median(ests, axis=0)
        return np.trunc(med).astype(np.int64)

    def inner_product(self, other: "CountSketch") -> int:
        """Unbiased join-size estimate: median over rows of the signed
        counter dot products (exact big-int arithmetic)."""
        if other.width != self.width or other.depth != self.depth:
            raise ValueError("Cannot inner-product CountSketches of "
                             "different shapes")
        dots = sorted(
            int((self.table[i].astype(object)
                 * other.table[i].astype(object)).sum())
            for i in range(self.depth))
        mid = len(dots) // 2
        if len(dots) % 2:
            return dots[mid]
        return (dots[mid - 1] + dots[mid]) // 2

    def self_moment(self) -> int:
        """Unbiased second-moment (F2 / self-join size) estimate: median
        over rows of ``sum_j C[i,j]^2`` (the AMS estimator; Alon, Matias
        & Szegedy 1996, realized on the Count-Sketch table)."""
        sums = sorted(int((self.table[i].astype(object) ** 2).sum())
                      for i in range(self.depth))
        mid = len(sums) // 2
        if len(sums) % 2:
            return sums[mid]
        return (sums[mid - 1] + sums[mid]) // 2

    def merge(self, *others: "CountSketch") -> "CountSketch":
        for o in others:
            if o.width != self.width or o.depth != self.depth:
                raise ValueError("Cannot merge CountSketches of "
                                 "different shapes")
            self.table += o.table
            self.n += o.n
        return self

    def row_error_bound(self, f2_res: float) -> float:
        """Per-row 8/9-probability error (paper Lemma 4)."""
        return 3.0 * math.sqrt(max(f2_res, 0.0) / self.width)

    def to_bytes(self) -> bytes:
        head = struct.pack(_HEADER_FMT, b"CSK1", self.width, self.depth)
        return head + struct.pack("<q", self.n) + \
            self.table.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountSketch":
        magic, width, depth = struct.unpack_from(_HEADER_FMT, buf, 0)
        if magic != b"CSK1":
            raise ValueError(f"bad CountSketch magic {magic!r}")
        c = cls(width, depth)
        (c.n,) = struct.unpack_from("<q", buf, _HEADER_SIZE)
        c.table = np.frombuffer(buf, dtype="<i8",
                                offset=_HEADER_SIZE + 8) \
            .reshape(depth, width).astype(np.int64)
        return c
