"""AVLTreeDigest (clustering variant): accuracy, compress, merge, serde.

Reference bounds: AVLTreeDigest.java:38-40 ("quantile error almost always
< 3/compression"), AccuracyTest.java:137-149 merge bounds, 20*compression
auto-compress (:156-159)."""

from __future__ import annotations

import numpy as np
import pytest

from t_digest_ray.state.avl import AVLTreeDigest


def _rank(s, x):
    return np.searchsorted(s, x, side="right") / len(s)


def test_accuracy_uniform(rng):
    data = rng.uniform(0, 1, 30_000)
    d = AVLTreeDigest(100)
    d.update_batch(data)
    s = np.sort(data)
    for q in [0.01, 0.1, 0.5, 0.9, 0.99]:
        assert abs(_rank(s, d.quantile(q)) - q) <= 3.0 / 100


def test_centroid_count_bounded(rng):
    d = AVLTreeDigest(50)
    d.update_batch(rng.normal(0, 1, 20_000))
    assert d.centroid_count <= 20 * 50
    d.compress()
    # after an explicit compress the summary is near the compression target
    assert d.centroid_count <= 10 * 50


def test_centroids_sorted_and_weights_sum(rng):
    data = rng.exponential(1.0, 10_000)
    d = AVLTreeDigest(100)
    d.update_batch(data)
    m, w = d.centroids()
    assert np.all(np.diff(m) >= 0)
    assert w.sum() == pytest.approx(10_000)
    assert d.min == data.min() and d.max == data.max()


def test_merge_within_accuracy_bounds(rng):
    data = rng.uniform(0, 100, 50_000)
    s = np.sort(data)
    for n_parts in (5, 20):
        parts = np.array_split(data, n_parts)
        subs = []
        for i, p in enumerate(parts):
            a = AVLTreeDigest(100, seed=i)
            a.update_batch(p)
            subs.append(a)
        m = AVLTreeDigest(100).merge(*subs)
        assert m.count == pytest.approx(len(data))
        for q in [0.01, 0.5, 0.99]:
            # AccuracyTest merge bound: abs rank err < 0.015
            assert abs(_rank(s, m.quantile(q)) - q) <= 0.015


def test_nan_rejected():
    d = AVLTreeDigest(100)
    with pytest.raises(ValueError):
        d.update(float("nan"))
    d.update_batch([1.0, np.nan, 2.0])  # batch path filters NaN
    assert d.count == 2


def test_serde_roundtrip(rng):
    d = AVLTreeDigest(100)
    d.update_batch(rng.uniform(0, 1, 5_000))
    b = d.to_bytes()
    d2 = AVLTreeDigest.from_bytes(b)
    assert d2.to_bytes() == b
    qs = np.linspace(0, 1, 11)
    assert np.array_equal(d.quantile_batch(qs), d2.quantile_batch(qs))


def test_agrees_with_merging_digest(rng):
    """Accuracy comparison role: both impls agree with the truth within
    their bounds on the same stream."""
    from t_digest_ray.state.tdigest import TDigest

    data = rng.lognormal(3, 1, 20_000)
    s = np.sort(data)
    a = AVLTreeDigest(100)
    a.update_batch(data)
    t = TDigest(100)
    t.update_batch(data)
    t.compress()
    for q in [0.1, 0.5, 0.9, 0.99]:
        ra = _rank(s, a.quantile(q))
        rt = _rank(s, t.quantile(q))
        assert abs(ra - q) <= 0.03 and abs(rt - q) <= 0.03


def test_java_interop_layout_and_roundtrip():
    """Byte parity with AVLTreeDigest.java:501-591: exact big-endian field
    layout (verified by hand-unpacking) and decode-through-clustering."""
    import struct

    rng = np.random.default_rng(3)
    d = AVLTreeDigest(100)
    d.update_batch(rng.uniform(0, 100, 2000))
    d.compress()

    vb = d.to_java_bytes()
    tag, mn, mx, comp = struct.unpack_from(">iddd", vb, 0)
    (n,) = struct.unpack_from(">i", vb, 28)
    assert tag == 1 and mn == d.min and mx == d.max
    assert comp == float(np.float32(d.compression))  # reference float cast
    assert n == len(d._means)
    means = struct.unpack_from(f">{n}d", vb, 32)
    assert list(means) == d._means
    counts = struct.unpack_from(f">{n}i", vb, 32 + 8 * n)
    assert sum(counts) == int(d.count)

    for small in (False, True):
        d2 = AVLTreeDigest.from_java_bytes(d.to_java_bytes(small=small))
        assert d2.min == d.min and d2.max == d.max
        assert d2.count == d.count
        # re-adding through clustering preserves quantiles tightly
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            assert abs(d2.cdf(d.quantile(q)) - q) < 0.02, (small, q)

    # small layout: float32 delta means, varint counts
    sb = d.to_java_bytes(small=True)
    tag2, = struct.unpack_from(">i", sb, 0)
    assert tag2 == 2
    assert len(sb) < len(vb)
