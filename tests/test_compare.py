"""Distribution comparison (Comparison.java port): llr G-test, chi2 over
quantile buckets, KS statistic."""

from __future__ import annotations

import numpy as np
import pytest

from t_digest_ray.state.compare import compare_chi2, compare_chi2_hist, ks, llr
from t_digest_ray.state.tdigest import TDigest


def _digest(data, compression=200):
    d = TDigest(compression)
    d.update_batch(np.asarray(data, dtype=np.float64))
    d.compress()
    return d


def test_llr_independent_table_is_small():
    # identical rows -> zero mutual information
    t = np.array([[10.0, 20.0, 30.0], [10.0, 20.0, 30.0]])
    assert llr(t) == pytest.approx(0.0, abs=1e-9)


def test_llr_disjoint_table_is_large():
    t = np.array([[100.0, 0.0], [0.0, 100.0]])
    # 2N * MI with MI = ln 2 -> 2*200*ln2
    assert llr(t) == pytest.approx(2 * 200 * np.log(2), rel=1e-6)


def test_llr_rejects_negative():
    with pytest.raises(ValueError):
        llr([[1.0, -2.0]])


def test_chi2_same_distribution_small_vs_shifted_large(rng):
    a = _digest(rng.normal(0, 1, 50_000))
    b = _digest(rng.normal(0, 1, 50_000))
    c = _digest(rng.normal(0.5, 1, 50_000))
    same = compare_chi2(a, b)
    diff = compare_chi2(a, c)
    # same-dist score ~ chi2(9); shifted by 0.5 sigma is enormous
    assert same < 100
    assert diff > 50 * max(same, 1.0)


def test_chi2_hist():
    h1 = np.array([100, 200, 300, 50])
    h2 = np.array([102, 196, 305, 47])
    h3 = np.array([300, 100, 50, 200])
    assert compare_chi2_hist(h1, h2) < 10
    assert compare_chi2_hist(h1, h3) > 100
    with pytest.raises(ValueError):
        compare_chi2_hist(h1, np.array([1, 2]))


def test_ks_same_vs_different(rng):
    a = _digest(rng.uniform(0, 1, 40_000))
    b = _digest(rng.uniform(0, 1, 40_000))
    c = _digest(rng.uniform(0.2, 1.2, 40_000))
    same = ks(a, b)
    diff = ks(a, c)
    # scaled KS under the null is O(1); a 0.2 cdf gap scales with sqrt(n)
    assert same < 3.0
    assert diff > 10.0
    assert ks(a, a) == pytest.approx(0.0, abs=1e-12)


def test_ks_empty():
    assert ks(TDigest(100), TDigest(100)) == 0.0
