"""Bloom filter for approximate set membership.

Built from the published construction (Bloom, CACM 1970; k-hash variant via
double hashing per Kirsch-Mitzenmacher, ESA 2006). Not in the reference
repo — required by the graft's north_rule (SURVEY.md §2.4).

* ``m`` bits (rounded up to a power of two) stored as a uint64 word array;
  ``k`` hash functions derived from one 64-bit hash.
* no false negatives; false-positive rate ~ ``(1 - e**(-k*n/m))**k``.
* merge = bitwise OR (associative, commutative, idempotent).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..functions.hashing import hash64, hash_i

_HEADER_FMT = "<4sqiq"  # magic, m_bits, k, n_added
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)


class BloomFilter:
    def __init__(self, n_bits: int = 1 << 20, k: int = 7):
        m = 1 << max(int(n_bits) - 1, 63).bit_length()  # next power of two
        if m < 64:
            m = 64
        if not 1 <= k <= 32:
            raise ValueError(f"k must be in [1, 32], got {k}")
        self.m = m
        self.k = int(k)
        self.words = np.zeros(m // 64, dtype=np.uint64)
        self.n_added = 0

    @classmethod
    def from_capacity(cls, n_items: int, fpp: float = 0.01) -> "BloomFilter":
        """Size for ~n_items at the target false-positive rate."""
        m = max(int(-n_items * math.log(fpp) / (math.log(2) ** 2)), 64)
        k = max(int(round(m / n_items * math.log(2))), 1)
        return cls(m, min(k, 32))

    def _bit_positions(self, values) -> np.ndarray:
        h = hash64(np.asarray(values))
        mask = np.uint64(self.m - 1)
        return np.stack([(hash_i(h, i) & mask) for i in range(self.k)])

    def update_batch(self, values, weights=None) -> None:
        arr = np.asarray(values)
        if arr.size == 0:
            return
        pos = self._bit_positions(arr).ravel()
        words = (pos >> np.uint64(6)).astype(np.int64)
        bits = np.left_shift(np.uint64(1), pos & np.uint64(63))
        np.bitwise_or.at(self.words, words, bits)
        self.n_added += arr.size

    add_batch = update_batch

    def contains(self, values) -> np.ndarray:
        """Vectorized membership test (no false negatives)."""
        arr = np.atleast_1d(np.asarray(values))
        if arr.size == 0:
            return np.empty(0, dtype=bool)
        pos = self._bit_positions(arr)  # (k, n)
        words = (pos >> np.uint64(6)).astype(np.int64)
        bits = np.left_shift(np.uint64(1), pos & np.uint64(63))
        hit = (self.words[words] & bits) != 0
        return hit.all(axis=0)

    def merge(self, *others: "BloomFilter") -> "BloomFilter":
        for o in others:
            if o.m != self.m or o.k != self.k:
                raise ValueError("Cannot merge Bloom filters with different shapes")
            np.bitwise_or(self.words, o.words, out=self.words)
            self.n_added += o.n_added
        return self

    def fill_ratio(self) -> float:
        set_bits = int(np.unpackbits(self.words.view(np.uint8)).sum())
        return set_bits / self.m

    def fpp_estimate(self) -> float:
        return float(self.fill_ratio() ** self.k)

    @property
    def size(self) -> int:
        return self.n_added

    def to_bytes(self) -> bytes:
        head = struct.pack(_HEADER_FMT, b"BLM1", self.m, self.k, self.n_added)
        return head + self.words.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BloomFilter":
        magic, m, k, n_added = struct.unpack_from(_HEADER_FMT, buf, 0)
        if magic != b"BLM1":
            raise ValueError(f"bad Bloom magic {magic!r}")
        b = cls(m, k)
        b.m = m
        b.words = np.frombuffer(buf, dtype="<u8",
                                offset=_HEADER_SIZE).astype(np.uint64)
        b.n_added = n_added
        return b
