"""Simple64 packing (functions/simple64.py) — byte-level parity with the
reference Simple64.java scheme, and the FloatHistogram Java-layout twins."""

from __future__ import annotations

import numpy as np
import pytest

from t_digest_ray.functions.simple64 import compress, decompress
from t_digest_ray.state.histogram import (FloatHistogram,
                                          float_histogram_from_java_bytes,
                                          float_histogram_to_java_bytes)


def test_golden_words():
    """Hand-computed words per the Simple64.java layout: 4 status bits
    low, first value at shift 4, step = width."""
    # one 60-bit-slot value: status 14
    assert compress([3]).tolist() == [14 | (3 << 4)]
    # sixty 1-bit values: status 1
    (w,) = compress([1] * 60).tolist()
    assert w == 1 | (((1 << 60) - 1) << 4)
    # two 30-bit values: status 13, second at shift 34
    (w,) = compress([5, 7]).tolist()
    assert w == 13 | (5 << 4) | (7 << 34)
    # fifteen 4-bit values: status 4
    vals = list(range(15))
    (w,) = compress(vals).tolist()
    want = 4
    for i, v in enumerate(vals):
        want |= v << (4 + 4 * i)
    assert w == want


def test_widened_last_slot_cases():
    """The 8-bit/7-value and 7-bit/8-value codes give the LAST slot 4
    extra bits (Simple64.java:100-104 encoder exemption, :764-782
    decoder masks) — the subtlest part of the scheme."""
    vals = [255] * 6 + [4000]          # 4000 needs 12 bits, slot 7 has 12
    words = compress(vals)
    assert len(words) == 1
    assert int(words[0]) & 0xF == 8    # status 8 = 7 values x 8 bits
    assert decompress(words, 7).tolist() == vals

    vals = [127] * 7 + [2000]          # 2000 needs 11 bits, slot 8 has 11
    words = compress(vals)
    assert len(words) == 1
    assert int(words[0]) & 0xF == 7    # status 7 = 8 values x 7 bits
    assert decompress(words, 8).tolist() == vals


def test_roundtrip_random_magnitudes(rng):
    for trial in range(20):
        n = int(rng.integers(1, 400))
        # mixed magnitudes force every width class over the trials
        exp = rng.integers(0, 59, n)
        vals = (rng.integers(0, 2, n) * (2 ** exp.astype(object))
                + rng.integers(0, 4, n).astype(object))
        vals = [int(v) for v in vals]
        words = compress(vals)
        assert decompress(words, n).tolist() == vals


def test_roundtrip_sparse_histogram_shape(rng):
    """The actual use case: long runs of zeros + occasional counts —
    must compress far below 8 bytes/value and round-trip exactly."""
    counts = np.zeros(1000, dtype=np.int64)
    idx = rng.choice(1000, 40, replace=False)
    counts[idx] = rng.integers(1, 10**9, 40)
    words = compress(counts)
    assert len(words) * 8 < 1000 * 8 // 4     # >=4x smaller than raw
    assert np.array_equal(decompress(words, 1000), counts)


def test_errors():
    with pytest.raises(ValueError):
        compress([-1])
    with pytest.raises(ValueError):
        compress([1 << 60])
    with pytest.raises(ValueError):
        decompress(np.array([0], dtype=np.uint64), 1)  # status 0 invalid


def test_float_histogram_java_layout_roundtrip(rng):
    h = FloatHistogram(0.001, 1000.0, 50.0)
    h.update_batch(np.exp(rng.normal(2.0, 2.0, 20000)))
    b = float_histogram_to_java_bytes(h)
    h2 = float_histogram_from_java_bytes(b)
    assert (h2.min, h2.max, h2._bits, h2._shift) == \
        (h.min, h.max, h._bits, h._shift)
    assert np.array_equal(h2.counts, h.counts)
    assert h2.cdf(10.0) == h.cdf(10.0)
    assert h2.quantile(0.5) == h.quantile(0.5)
    # field layout spot check: big-endian min/max doubles + bits byte
    import struct
    mn, mx, bits, shift, nbytes = struct.unpack_from(">ddbbh", b, 0)
    assert (mn, mx, bits, shift) == (0.001, 1000.0, 4, 48)
    assert nbytes == len(b) - struct.calcsize(">ddbbh")
    assert nbytes % 8 == 0
