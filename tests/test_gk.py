"""Greenwald-Khanna summary tests — rank brackets, published eps bound,
merge-tree behavior, serde."""

import numpy as np
import pytest

from t_digest_ray.state.gk import GKSummary

QS = (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)


def _rank_err(sv, est, q):
    n = len(sv)
    lo = np.searchsorted(sv, est, "left") / n
    hi = np.searchsorted(sv, est, "right") / n
    return max(q - hi, lo - q, 0.0)


def _data(seed, n=120_000):
    rng = np.random.default_rng(seed)
    return rng.lognormal(3.0, 2.0, n)


def test_single_stream_bound_and_brackets():
    data = _data(1)
    sk = GKSummary(eps=0.01)
    for chunk in np.array_split(data, 17):
        sk.update_batch(chunk)
    sv = np.sort(data)
    assert sk.n == len(data)
    for q in QS:
        assert _rank_err(sv, sk.quantile(q), q) <= sk.eps
    # hard rank brackets: every stored value's true rank interval
    # intersects [rmin, rmax]
    rmin = np.cumsum(sk.g)
    rmax = rmin + sk.delta
    lo = np.searchsorted(sv, sk.v, "left") + 1
    hi = np.searchsorted(sv, sk.v, "right")
    assert ((rmin <= hi) & (rmax >= lo)).all()


def test_two_level_merge_tree_bound():
    data = _data(2)
    parts = np.array_split(data, 24)

    def build(p):
        s = GKSummary(eps=0.01)
        s.update_batch(p)
        return s

    level1 = [GKSummary(eps=0.01).merge(*[build(p) for p in parts[i::4]])
              for i in range(4)]
    top = GKSummary(eps=0.01).merge(*level1)
    assert top.n == len(data)
    sv = np.sort(data)
    for q in QS:
        assert _rank_err(sv, top.quantile(q), q) <= 1.5 * top.eps
    # summary stays summary-sized, never O(n)
    assert top.size < 5000


def test_returns_observed_values_only():
    data = np.unique(_data(3, 50_000))
    sk = GKSummary(eps=0.02)
    sk.update_batch(data)
    pool = set(data.tolist())
    for q in QS:
        assert sk.quantile(q) in pool


def test_extremes_exact():
    data = _data(4, 10_000)
    sk = GKSummary(eps=0.01)
    for chunk in np.array_split(data, 5):
        sk.update_batch(chunk)
    assert sk.quantile(0.0) == data.min()
    assert sk.quantile(1.0) == data.max()


def test_cdf_rank():
    data = np.arange(1.0, 10_001.0)
    sk = GKSummary(eps=0.005)
    sk.update_batch(data)
    for x in (250.0, 5000.0, 9750.0):
        assert abs(sk.cdf(x) - x / 10_000) <= 2 * sk.eps


def test_weighted_and_empty():
    sk = GKSummary(eps=0.1)
    sk.update_batch(np.array([1.0, 2.0, 3.0]), weights=np.array([7, 2, 1]))
    assert sk.n == 10
    assert sk.quantile(0.5) == 1.0
    empty = GKSummary.from_bytes(GKSummary(eps=0.1).to_bytes())
    assert empty.n == 0 and np.isnan(empty.quantile(0.5))


def test_serde_roundtrip():
    sk = GKSummary(eps=0.01)
    sk.update_batch(_data(5, 30_000))
    r = GKSummary.from_bytes(sk.to_bytes())
    assert r.n == sk.n and (r.v == sk.v).all() and (r.g == sk.g).all()
    assert r.quantile(0.9) == sk.quantile(0.9)


def test_eps_mismatch_raises():
    a, b = GKSummary(eps=0.01), GKSummary(eps=0.02)
    b.update_batch(np.array([1.0]))
    with pytest.raises(ValueError):
        a.merge(b)
