"""Mergeable fixed-bin log histograms.

Semantics per the reference (``/root/reference/core/src/main/java/com/
tdunning/math/stats/``):

* ``FloatHistogram`` (FloatHistogram.java:44-77): log-spaced bins obtained by
  truncating the float64 bit pattern of ``x/min`` — keep ``bits_of_precision``
  mantissa bits, so bin index = ``bits(x/min) >> (52 - b) - (0x3ff << b)``.
  ``bits_of_precision = ceil(log2(bins_per_decade * log10(2)))``.
* ``LogHistogram`` (LogHistogram.java:39-57, 70-95): bins of relative width
  ``1 + epsilon`` using ``approxLog2`` (float exponent + quadratic mantissa
  correction, error < ±0.01, exact at powers of two) with exact inverse
  ``pow2``.
* Base behavior (Histogram.java:53-79): values <= min -> bin 0, >= max ->
  last bin; merge requires identical bounds/precision and is an elementwise
  add (FloatHistogram.java:139-152).

All updates are vectorized (np.bincount over bit-twiddled indices). The
byte encoding is a little-endian header + BIT-PACKED counts: the counts
array is split into 64-value blocks, each stored at the fixed bit width of
its largest value (width 0 = all-zero block costs one header byte) — the
same word-aligned fixed-width family as the reference's Simple64
(Simple64.java:948-969, itself the public Simple-8b scheme of Anh &
Moffat), re-derived here as vectorized numpy pack/unpack rather than a
port. Typical sparse histograms shrink ~5-20x vs raw int64 rows, which is
what crosses the shuffle. Versioning: the bit-packed layout carries v2
magics (FHG2/LHG2); v1 blobs (v1 magic, no enc byte, raw int64 counts)
decode on a dedicated legacy branch, and an enc=0 raw flag remains
decodable inside the v2 layout.
"""

from __future__ import annotations

import struct

import numpy as np

_HEADER_FMT = "<4sdddB"  # magic, min, max, precision-parameter, enc flag
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)
# Pre-enc-byte layout (v1 magics): magic, min, max, parameter — followed
# directly by raw little-endian int64 counts. The enc byte shifted every
# later offset by one, so the new layout carries NEW magics (FHG2/LHG2)
# and v1 blobs keep decoding on their own branch (ADVICE r02).
_LEGACY_HEADER_FMT = "<4sddd"
_LEGACY_HEADER_SIZE = struct.calcsize(_LEGACY_HEADER_FMT)
_ENC_RAW = 0      # raw little-endian int64 counts
_ENC_PACKED = 1   # 64-value blocks, per-block fixed bit width
_BLOCK = 64


def _pack_counts(counts: np.ndarray) -> bytes:
    """Blocked fixed-width bit packing of a non-negative int64 array."""
    v = counts.astype(np.uint64)
    n = len(v)
    n_blocks = -(-n // _BLOCK) if n else 0
    pad = n_blocks * _BLOCK - n
    if pad:
        v = np.concatenate([v, np.zeros(pad, np.uint64)])
    widths = np.empty(n_blocks, dtype=np.uint8)
    payloads = []
    for i in range(n_blocks):
        blk = v[i * _BLOCK:(i + 1) * _BLOCK]
        w = int(blk.max()).bit_length()
        widths[i] = w
        if w:
            bits = ((blk[:, None] >> np.arange(w, dtype=np.uint64))
                    & np.uint64(1)).astype(np.uint8)
            payloads.append(np.packbits(bits.reshape(-1),
                                        bitorder="little").tobytes())
    head = struct.pack("<IH", n, n_blocks)
    return head + widths.tobytes() + b"".join(payloads)


def _unpack_counts(buf: bytes, offset: int) -> np.ndarray:
    n, n_blocks = struct.unpack_from("<IH", buf, offset)
    offset += struct.calcsize("<IH")
    widths = np.frombuffer(buf, np.uint8, count=n_blocks, offset=offset)
    offset += n_blocks
    out = np.zeros(n_blocks * _BLOCK, dtype=np.uint64)
    for i, w in enumerate(widths):
        if not w:
            continue
        nbytes = _BLOCK * int(w) // 8
        bits = np.unpackbits(
            np.frombuffer(buf, np.uint8, count=nbytes, offset=offset),
            bitorder="little").reshape(_BLOCK, int(w)).astype(np.uint64)
        out[i * _BLOCK:(i + 1) * _BLOCK] = \
            (bits << np.arange(int(w), dtype=np.uint64)).sum(axis=1)
        offset += nbytes
    return out[:n].astype(np.int64)


class _BaseHistogram:
    magic: bytes
    legacy_magic: bytes

    def __init__(self, min_value: float, max_value: float, param: float):
        if max_value <= 2 * min_value:
            raise ValueError(f"Illegal min, max ({min_value}, {max_value})")
        if min_value <= 0 or max_value <= 0:
            raise ValueError("Min and max must be positive")
        self.min = float(min_value)
        self.max = float(max_value)
        self.param = float(param)
        n_bins = int(self._bucket_index(np.asarray([self.max]))[0]) + 1
        if n_bins > 10000:
            raise ValueError(f"Excessive number of bins {n_bins}")
        self.counts = np.zeros(n_bins, dtype=np.int64)

    # -- protocol -----------------------------------------------------------

    def update_batch(self, values, weights=None) -> None:
        x = np.ascontiguousarray(values, dtype=np.float64)
        if x.size == 0:
            return
        idx = np.empty(x.size, dtype=np.int64)
        inner = (x > self.min) & (x < self.max)
        idx[x <= self.min] = 0
        idx[x >= self.max] = len(self.counts) - 1
        idx[inner] = np.clip(self._bucket_index(x[inner]), 0,
                             len(self.counts) - 1)
        if weights is None:
            self.counts += np.bincount(idx, minlength=len(self.counts))
        else:
            w = np.ascontiguousarray(weights, dtype=np.float64)
            self.counts += np.bincount(
                idx, weights=w, minlength=len(self.counts)).astype(np.int64)

    def merge(self, *others) -> "_BaseHistogram":
        for o in others:
            if (type(o) is not type(self) or o.min != self.min
                    or o.max != self.max or len(o.counts) != len(self.counts)):
                raise ValueError(
                    "Can only merge histograms with identical bounds and precision")
            self.counts += o.counts
        return self

    @property
    def size(self) -> int:
        return int(self.counts.sum())

    def bounds(self) -> np.ndarray:
        """Lower bound of every bin."""
        return self._lower_bound(np.arange(len(self.counts)))

    def cdf(self, x: float) -> float:
        idx = int(np.clip(self._bucket_index(np.asarray([x]))[0], 0,
                          len(self.counts) - 1))
        total = self.counts.sum()
        if total == 0:
            return float("nan")
        return float(self.counts[:idx].sum() / total)

    def quantile(self, q: float) -> float:
        """Lower bound of the bin containing rank q."""
        total = self.counts.sum()
        if total == 0:
            return float("nan")
        target = q * total
        cum = np.cumsum(self.counts)
        idx = int(np.searchsorted(cum, target, side="left"))
        idx = min(idx, len(self.counts) - 1)
        return float(self._lower_bound(np.asarray([idx]))[0])

    def to_bytes(self) -> bytes:
        head = struct.pack(_HEADER_FMT, self.magic, self.min, self.max,
                           self.param, _ENC_PACKED)
        return head + _pack_counts(self.counts)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "_BaseHistogram":
        if buf[:4] == cls.legacy_magic:
            # v1 layout: no enc byte, raw int64 counts right after header
            _, mn, mx, param = struct.unpack_from(_LEGACY_HEADER_FMT, buf, 0)
            h = cls(mn, mx, param)
            counts = np.frombuffer(buf, dtype="<i8",
                                   offset=_LEGACY_HEADER_SIZE).copy()
            if counts.size != h.counts.size:
                raise ValueError("bin count mismatch in serialized histogram")
            h.counts = counts.astype(np.int64)
            return h
        magic, mn, mx, param, enc = struct.unpack_from(_HEADER_FMT, buf, 0)
        if magic != cls.magic:
            raise ValueError(f"bad histogram magic {magic!r}")
        h = cls(mn, mx, param)
        if enc == _ENC_PACKED:
            counts = _unpack_counts(buf, _HEADER_SIZE)
        elif enc == _ENC_RAW:
            counts = np.frombuffer(buf, dtype="<i8",
                                   offset=_HEADER_SIZE).copy()
        else:
            raise ValueError(f"unknown histogram encoding {enc}")
        if counts.size != h.counts.size:
            raise ValueError("bin count mismatch in serialized histogram")
        h.counts = counts.astype(np.int64)
        return h

    # -- impl ---------------------------------------------------------------

    def _bucket_index(self, x: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def _lower_bound(self, k: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class FloatHistogram(_BaseHistogram):
    """Log-ish bins via float64 bit truncation (FloatHistogram.java:69-77)."""

    magic = b"FHG2"
    legacy_magic = b"FHG1"

    def __init__(self, min_value: float, max_value: float,
                 bins_per_decade: float = 50.0):
        if not 5 <= bins_per_decade <= 10000:
            raise ValueError(
                f"Unreasonable number of bins per decade {bins_per_decade}")
        self._bits = int(np.ceil(
            np.log(bins_per_decade * np.log10(2)) / np.log(2)))
        self._shift = 52 - self._bits
        self._offset = 0x3FF << self._bits
        super().__init__(min_value, max_value, bins_per_decade)

    def _bucket_index(self, x: np.ndarray) -> np.ndarray:
        scaled = (x / self.min).view(np.uint64)
        return (scaled >> np.uint64(self._shift)).astype(np.int64) - self._offset

    def _lower_bound(self, k: np.ndarray) -> np.ndarray:
        bits = ((k.astype(np.int64) + (np.int64(0x3FF) << self._bits))
                << (52 - self._bits))
        return self.min * bits.view(np.float64)


def approx_log2(x: np.ndarray) -> np.ndarray:
    """Float-exponent log2 with quadratic mantissa correction
    (LogHistogram.java:70-77); error < ±0.01, exact at powers of two."""
    bits = np.asarray(x, dtype=np.float64).view(np.uint64)
    exponent = ((bits & np.uint64(0x7FF0000000000000)) >> np.uint64(52)) \
        .astype(np.float64) - 1024.0
    m = ((bits & np.uint64(0x800FFFFFFFFFFFFF))
         | np.uint64(0x3FF0000000000000)).view(np.float64)
    return m * (2.0 - (1.0 / 3.0) * m) + exponent - (2.0 / 3.0)


def pow2_approx(x: np.ndarray) -> np.ndarray:
    """Exact inverse of approx_log2 (LogHistogram.java:86-92)."""
    x = np.asarray(x, dtype=np.float64)
    exponent = np.floor(x) - 1
    frac = x - exponent
    m = 3.0 - np.sqrt(7.0 - 3.0 * frac)
    return 2.0 ** (exponent + 1) * m


class LogHistogram(_BaseHistogram):
    """Bins of relative width (1 + epsilon) (LogHistogram.java:39-57)."""

    magic = b"LHG2"
    legacy_magic = b"LHG1"

    def __init__(self, min_value: float, max_value: float,
                 epsilon_factor: float = 0.1):
        if not 1e-6 <= epsilon_factor <= 0.5:
            raise ValueError(f"Unreasonable epsilon {epsilon_factor}")
        self._log_factor = np.log(2) / np.log1p(epsilon_factor)
        self._log_offset = float(
            approx_log2(np.asarray([min_value]))[0] * self._log_factor)
        super().__init__(min_value, max_value, epsilon_factor)

    def _bucket_index(self, x: np.ndarray) -> np.ndarray:
        return (approx_log2(x) * self._log_factor - self._log_offset) \
            .astype(np.int64)

    def _lower_bound(self, k: np.ndarray) -> np.ndarray:
        return pow2_approx((k + self._log_offset) / self._log_factor)


# --------------------------------------------------- Java-layout interop

def float_histogram_to_java_bytes(h: FloatHistogram) -> bytes:
    """Serialize in the reference FloatHistogram.writeObject field layout
    (FloatHistogram.java:94-110): BIG-endian min/max doubles,
    bitsOfPrecision byte, shift byte, a short byte-length, then the
    counts as Simple64-compressed big-endian words (the
    Simple64.java:948-958 packing, reproduced bit-exactly in
    functions/simple64.py). LogHistogram has no Java layout to match —
    its writeObject is empty in the reference (LogHistogram.java:108)."""
    from ..functions.simple64 import compress

    words = compress(h.counts)
    body = words.byteswap().tobytes()  # big-endian words
    if len(body) > 0x7FFF:
        raise ValueError("compressed counts exceed Java short length")
    return (struct.pack(">ddbbh", h.min, h.max, h._bits, h._shift,
                        len(body)) + body)


def float_histogram_from_java_bytes(buf: bytes) -> FloatHistogram:
    """Decode the FloatHistogram.readObject field layout
    (FloatHistogram.java:113-133): bin count is re-derived from
    (min, max, bits) exactly as the Java side does. bins_per_decade is
    not stored by Java — it is reconstructed as the canonical
    2^bits / log10(2) (any value with the same ceil(log2(...)) produces
    an identical histogram)."""
    from ..functions.simple64 import decompress

    mn, mx, bits, shift, nbytes = struct.unpack_from(">ddbbh", buf, 0)
    if shift != 52 - bits:
        raise ValueError(f"inconsistent shift {shift} for {bits} bits")
    bpd = float(2 ** bits) / float(np.log10(2.0))
    h = FloatHistogram(mn, mx, bpd)
    if h._bits != bits:
        raise ValueError(f"failed to reconstruct {bits}-bit histogram")
    off = struct.calcsize(">ddbbh")
    words = np.frombuffer(buf, dtype=">u8", count=nbytes // 8,
                          offset=off).astype(np.uint64)
    h.counts = decompress(words, len(h.counts)).astype(np.int64)
    return h
