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
