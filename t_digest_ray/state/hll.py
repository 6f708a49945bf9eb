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


class SparseHyperLogLog:
    """SPARSE representation of the same HLL (the HLL++ paper's §5.1
    idea, simplified to (index, rank) pairs): a distinct counter over
    MANY small groups pays for dense registers up front — at p=14
    that is 16 KiB per group even when the group has three members.
    The sparse form stores only the touched registers (5 bytes each)
    and PROMOTES itself to the dense array the moment the dense form
    becomes smaller, so per-group memory is
    ``min(5 * touched, 2**p)`` bytes.

    Estimates are BIT-EQUAL to the dense sketch over the same input by
    construction: identical hash, identical (index, rank) function,
    identical max-merge — the sparse form is just a different container
    for the same register file (``to_dense`` materializes it). Merge is
    associative/commutative/idempotent in either form and promotion is
    transparent: ``merge`` returns the representation that fits.
    """

    MAGIC = b"HLS1"

    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError(f"p must be in [4, 18], got {p}")
        self.p = int(p)
        self.m = 1 << p
        self.idx = np.empty(0, dtype=np.uint32)
        self.rank = np.empty(0, dtype=np.uint8)

    # dense is smaller once touched registers exceed m/5 (5-byte pairs)
    @property
    def _promote_at(self) -> int:
        return self.m // 5

    def _absorb(self, idx: np.ndarray, rank: np.ndarray) -> None:
        idx = np.concatenate([self.idx, idx.astype(np.uint32)])
        rank = np.concatenate([self.rank, rank.astype(np.uint8)])
        # per-index max: sort by (idx, rank) and keep each idx's last
        order = np.lexsort((rank, idx))
        idx, rank = idx[order], rank[order]
        last = np.concatenate([idx[1:] != idx[:-1], [True]])
        self.idx, self.rank = idx[last], rank[last]

    def update_batch(self, values, weights=None):
        arr = np.asarray(values)
        if arr.size == 0:
            return self
        h = hash64(arr)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h & np.uint64((1 << (64 - self.p)) - 1)
        bl = np.frexp(rest.astype(np.float64))[1]
        rank = np.where(rest == 0, 64 - self.p + 1,
                        64 - self.p - bl + 1).astype(np.uint8)
        self._absorb(idx, rank)
        if len(self.idx) > self._promote_at:
            return self.to_dense()
        return self

    def to_dense(self) -> HyperLogLog:
        h = HyperLogLog(self.p)
        h.registers[self.idx.astype(np.int64)] = self.rank
        return h

    def merge(self, *others):
        out = self
        for o in others:
            if o.p != self.p:
                raise ValueError(
                    "Cannot merge HLLs with different precision")
            if isinstance(o, HyperLogLog):
                d = out.to_dense() if isinstance(
                    out, SparseHyperLogLog) else out
                d.merge(o)
                out = d
            elif isinstance(out, HyperLogLog):
                out.merge(o.to_dense())
            else:
                out._absorb(o.idx, o.rank)
                if len(out.idx) > out._promote_at:
                    out = out.to_dense()
        return out

    def estimate(self) -> float:
        return self.to_dense().estimate()

    @property
    def size(self) -> float:
        return self.estimate()

    def to_bytes(self) -> bytes:
        head = struct.pack("<4sBI", self.MAGIC, self.p, len(self.idx))
        return head + self.idx.astype("<u4").tobytes() \
            + self.rank.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes):
        if buf[:4] == b"HLL1":                 # promoted partner
            return HyperLogLog.from_bytes(buf)
        magic, p, n = struct.unpack_from("<4sBI", buf, 0)
        if magic != cls.MAGIC:
            raise ValueError(f"bad sparse-HLL magic {magic!r}")
        off = struct.calcsize("<4sBI")
        s = cls(p)
        s.idx = np.frombuffer(buf, dtype="<u4", offset=off,
                              count=n).astype(np.uint32)
        s.rank = np.frombuffer(buf, dtype=np.uint8,
                               offset=off + 4 * n, count=n).copy()
        return s
