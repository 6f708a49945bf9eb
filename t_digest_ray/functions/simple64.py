"""Simple64 word-aligned bit packing — byte-compatible with the
reference's Simple64.java (itself the public Simple-8b family of Anh &
Moffat, "Index compression using 64-bit words", 2010).

Each output word is 64 bits: a 4-bit status code in the LOW bits, then
60 data bits holding N values of W bits each, where (N, W) comes from
the status table below. Two codes give the LAST slot extra room (the
60/W remainder): 7 values x 8 bits leaves the 7th slot 12 bits, and
8 values x 7 bits leaves the 8th slot 11 bits — the encoder's greedy
width scan knows about both (Simple64.java:100-104 special cases), so
a faithful encoder must reproduce that scan exactly, not just the
word layout. ``compress`` here mirrors the selection logic of
Simple64.java:436-483 decision for decision; tests verify the whole
pipeline against hand-computed words and exhaustive round-trips.

This codec exists for byte interop with the Java library's
FloatHistogram.writeObject (FloatHistogram.java:94-110); the shuffle
path keeps the repo's own vectorized blocked packing
(state/histogram.py), which is faster to encode in numpy.
"""

from __future__ import annotations

import numpy as np

_DATA_BITS = 60
# width -> (status code, values per word)
_ENCODE = {60: (14, 1), 30: (13, 2), 20: (12, 3), 15: (11, 4),
           12: (10, 5), 10: (9, 6), 8: (8, 7), 7: (7, 8), 6: (6, 10),
           5: (5, 12), 4: (4, 15), 3: (3, 20), 2: (2, 30), 1: (1, 60)}
# status code -> (width, values per word, width of the LAST slot)
_DECODE = {st: (w, n, {8: 12, 7: 11}.get(w, w))
           for w, (st, n) in _ENCODE.items()}


def _select_width(vals: list[int], off: int, size: int) -> int:
    """The greedy width scan of Simple64.java:436-483: grow the bit
    width to fit each next value (with the 8-bit/7-slot and
    7-bit/8-slot last-slot exemptions), stop when the word is full,
    then widen to spend any leftover bits."""
    n_fit = 1
    width = 1
    limit = 2  # 1 << width
    while True:
        v = vals[off + n_fit - 1]
        if v < 0:
            raise ValueError(f"Simple64 cannot encode negative value {v}")
        while v >= limit and width < _DATA_BITS:
            if (width == 7 and n_fit == 8 and v < (limit << 4)) or \
               (width == 8 and n_fit == 7 and v < (limit << 4)):
                break  # value fits the widened last slot
            width += 1
            limit <<= 1
            if n_fit * width > _DATA_BITS:
                n_fit -= 1
                break
        n_fit += 1
        if n_fit * width > _DATA_BITS or n_fit > size:
            break
    n_fit -= 1
    if n_fit == 0:
        raise ValueError("Simple64 cannot encode values over 60 bits")
    while n_fit * (width + 1) <= _DATA_BITS:
        width += 1
    if (n_fit + 1) * width <= _DATA_BITS:
        width += 1
    return width


def compress(values) -> np.ndarray:
    """Pack non-negative ints (< 2^60) into Simple64 words; returns a
    uint64 array bit-identical to Simple64.compress."""
    vals = [int(v) for v in np.asarray(values).ravel()]
    if vals and max(vals) >= (1 << _DATA_BITS):
        raise ValueError("Simple64 cannot encode values over 60 bits")
    out: list[int] = []
    off = 0
    remaining = len(vals)
    while remaining > 0:
        width = _select_width(vals, off, remaining)
        status, per_word = _ENCODE[width]
        word = status
        shift = 4
        for i in range(per_word):
            word |= vals[off + i] << shift
            shift += width
        out.append(word & 0xFFFFFFFFFFFFFFFF)
        off += per_word
        remaining -= per_word
    return np.array(out, dtype=np.uint64)


def decompress(words, n: int) -> np.ndarray:
    """Unpack ``n`` values from Simple64 words (Simple64.java:688-946
    decode table, including the widened last slots)."""
    out = np.zeros(n, dtype=np.int64)
    pos = 0
    for w in np.asarray(words, dtype=np.uint64):
        if pos >= n:
            break
        word = int(w)
        status = word & 0xF
        if status not in _DECODE:
            raise ValueError(f"unknown Simple64 status {status}")
        width, per_word, last_width = _DECODE[status]
        shift = 4
        for i in range(per_word):
            bits = last_width if i == per_word - 1 else width
            out[pos] = (word >> shift) & ((1 << bits) - 1)
            shift += width
            pos += 1
            if pos >= n and i != per_word - 1:
                raise ValueError(
                    "Simple64 word holds more values than expected")
    if pos != n:
        raise ValueError(f"Simple64 stream ended at {pos} of {n} values")
    return out
