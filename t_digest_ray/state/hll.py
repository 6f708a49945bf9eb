"""HyperLogLog distinct-count sketch (dense registers).

Built from the published algorithm (Flajolet, Fusy, Gandouet, Meunier:
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm", AofA 2007) with the standard small/large-range corrections of
the HLL++ paper (Heule, Nunkesser, Hall, EDBT 2013, without the sparse
mode). Not present in the reference repo — required by the graft's
north_rule (SURVEY.md §2.4).

* ``p`` precision bits -> ``m = 2**p`` uint8 registers (p=14 -> 16 KiB,
  relative standard error ``1.04/sqrt(m)`` ~ 0.81%).
* update is vectorized: one 64-bit hash per value, register index from the
  top ``p`` bits, rank = leading-zero count of the remaining ``64-p`` bits
  (exact via frexp since ``64-p <= 53`` bits fit a float64 mantissa).
* merge = elementwise register max (associative, commutative, idempotent).
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.hashing import hash64

_HEADER_FMT = "<4sB"
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HyperLogLog:
    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError(f"p must be in [4, 18], got {p}")
        self.p = int(p)
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update_batch(self, values, weights=None) -> None:
        """weights are ignored — distinctness is weight-free."""
        arr = np.asarray(values)
        if arr.size == 0:
            return
        h = hash64(arr)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h & np.uint64((1 << (64 - self.p)) - 1)
        # bit_length via frexp (exact: rest < 2**(64-p) <= 2**60... values
        # up to 2**50 for p=14 are exactly representable; for p<11 clamp)
        bl = np.frexp(rest.astype(np.float64))[1]
        rank = np.where(rest == 0, 64 - self.p + 1, 64 - self.p - bl + 1) \
            .astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, *others: "HyperLogLog") -> "HyperLogLog":
        for o in others:
            if o.p != self.p:
                raise ValueError("Cannot merge HLLs with different precision")
            np.maximum(self.registers, o.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        regs = self.registers.astype(np.float64)
        raw = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.registers == 0))
        if raw <= 2.5 * m and zeros > 0:
            return float(m * np.log(m / zeros))  # linear counting
        if raw > (1 << 32) / 30.0:
            return float(-(1 << 32) * np.log1p(-raw / (1 << 32)))
        return float(raw)

    @property
    def size(self) -> float:
        return self.estimate()

    @staticmethod
    def relative_error(p: int) -> float:
        return 1.04 / np.sqrt(1 << p)

    def to_bytes(self) -> bytes:
        return struct.pack(_HEADER_FMT, b"HLL1", self.p) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HyperLogLog":
        magic, p = struct.unpack_from(_HEADER_FMT, buf, 0)
        if magic != b"HLL1":
            raise ValueError(f"bad HLL magic {magic!r}")
        h = cls(p)
        h.registers = np.frombuffer(
            buf, dtype=np.uint8, offset=_HEADER_SIZE).copy()
        return h
