"""Count-min sketch for frequency estimation / heavy hitters.

Built from the published algorithm (Cormode, Muthukrishnan: "An improved
data stream summary: the count-min sketch and its applications", J.
Algorithms 2005). Not in the reference repo — required by the graft's
north_rule (SURVEY.md §2.4).

* ``depth x width`` int64 counter matrix; point estimate = min over rows;
  guarantees ``est >= true`` and ``est <= true + eps*N`` with probability
  ``1 - delta`` where ``eps = e/width``, ``delta = e**-depth``.
* one base hash per value, the d row positions derived by double hashing
  (Kirsch-Mitzenmacher) — vectorized ``np.add.at`` scatter updates.
* merge = elementwise add (associative/commutative).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..functions.hashing import hash64, hash_i

_HEADER_FMT = "<4sii"
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)


class CountMin:
    def __init__(self, width: int = 2048, depth: int = 5):
        if width < 8 or depth < 1 or depth > 16:
            raise ValueError(f"bad CMS shape ({width}, {depth})")
        self.width = int(width)
        self.depth = int(depth)
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.n = 0  # total added weight

    @classmethod
    def from_error(cls, epsilon: float, delta: float) -> "CountMin":
        """Size for additive error eps*N with failure prob delta."""
        return cls(width=int(math.ceil(math.e / epsilon)),
                   depth=int(math.ceil(math.log(1.0 / delta))))

    def _positions(self, values) -> np.ndarray:
        h = hash64(np.asarray(values))
        return np.stack([
            (hash_i(h, i) % np.uint64(self.width)).astype(np.int64)
            for i in range(self.depth)])

    def update_batch(self, values, weights=None) -> None:
        arr = np.asarray(values)
        if arr.size == 0:
            return
        w = (np.ones(arr.size, dtype=np.int64) if weights is None
             else np.asarray(weights).astype(np.int64))
        pos = self._positions(arr)
        for i in range(self.depth):
            np.add.at(self.table[i], pos[i], w)
        self.n += int(w.sum())

    def estimate(self, values) -> np.ndarray:
        """Vectorized point-frequency estimates (>= true count)."""
        arr = np.atleast_1d(np.asarray(values))
        if arr.size == 0:
            return np.empty(0, dtype=np.int64)
        pos = self._positions(arr)
        ests = np.stack([self.table[i][pos[i]] for i in range(self.depth)])
        return ests.min(axis=0)

    def inner_product(self, other: "CountMin") -> int:
        """CM estimate of the inner product sum_k f_a(k) * f_b(k) — the
        equi-join size of the two sketched multisets (Cormode,
        Muthukrishnan 2005 §4.2): min over rows of the row-wise counter
        dot products. Guarantees ``est >= true`` and
        ``est <= true + eps * n_a * n_b`` with probability ``1 - delta``.
        Requires identical (width, depth) so the hash family matches.
        Exact big-int arithmetic (object dtype) — the dot product of two
        petabyte-scale counter rows must not wrap int64."""
        if other.width != self.width or other.depth != self.depth:
            raise ValueError("Cannot inner-product CMS of different shapes")
        return min(
            int((self.table[i].astype(object)
                 * other.table[i].astype(object)).sum())
            for i in range(self.depth))

    def merge(self, *others: "CountMin") -> "CountMin":
        for o in others:
            if o.width != self.width or o.depth != self.depth:
                raise ValueError("Cannot merge CMS with different shapes")
            self.table += o.table
            self.n += o.n
        return self

    @property
    def epsilon(self) -> float:
        return math.e / self.width

    @property
    def size(self) -> int:
        return self.n

    def to_bytes(self) -> bytes:
        head = struct.pack(_HEADER_FMT, b"CMS1", self.width, self.depth)
        return head + struct.pack("<q", self.n) + \
            self.table.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountMin":
        magic, width, depth = struct.unpack_from(_HEADER_FMT, buf, 0)
        if magic != b"CMS1":
            raise ValueError(f"bad CMS magic {magic!r}")
        c = cls(width, depth)
        (c.n,) = struct.unpack_from("<q", buf, _HEADER_SIZE)
        c.table = np.frombuffer(buf, dtype="<i8",
                                offset=_HEADER_SIZE + 8) \
            .reshape(depth, width).astype(np.int64)
        return c
