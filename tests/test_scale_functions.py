"""Layer-1 property tests on scale functions.

Mirrors the reference's ScaleFunctionTests.java:171-262 (k/q inverse
round-trip, monotonicity, non-negative max sizes) without porting code.
"""

import numpy as np
import pytest

from t_digest_ray.state.scale_functions import (K_0, K_1, K_1_FAST,
                                                K_1_GLUED, K_2, K_2_GLUED,
                                                K_2_NO_NORM, K_3, K_3_GLUED,
                                                K_3_NO_NORM, K_QUADRATIC,
                                                fast_asin, get_scale)

BASE = [K_0, K_1, K_2, K_3]
EXTENDED = [K_1_GLUED, K_1_FAST, K_2_GLUED, K_3_GLUED, K_QUADRATIC,
            K_2_NO_NORM, K_3_NO_NORM]
ALL = BASE + EXTENDED


@pytest.mark.parametrize("scale", ALL, ids=lambda s: s.name)
@pytest.mark.parametrize("compression,n", [(100, 1e4), (50, 1e6), (500, 1e9)])
def test_kq_inverse_roundtrip(scale, compression, n):
    norm = scale.normalizer(compression, n)
    qs = np.concatenate([
        np.linspace(1e-6, 1 - 1e-6, 101),
        [1e-10, 1 - 1e-10, 0.5],
    ])
    ks = scale.k(qs, norm)
    back = scale.q(ks, norm)
    assert np.allclose(back, qs, atol=1e-8)


@pytest.mark.parametrize("scale", ALL, ids=lambda s: s.name)
def test_k_monotone_nondecreasing(scale):
    norm = scale.normalizer(100, 1e6)
    qs = np.linspace(0, 1, 1001)
    ks = scale.k(qs, norm)
    assert np.all(np.diff(ks) >= -1e-12)


@pytest.mark.parametrize("scale", ALL, ids=lambda s: s.name)
def test_scalar_matches_vectorized(scale):
    norm = scale.normalizer(200, 1e7)
    for q in [1e-9, 0.001, 0.25, 0.5, 0.75, 0.999, 1 - 1e-9]:
        assert scale.k_scalar(q, norm) == pytest.approx(float(scale.k(q, norm)), abs=1e-12)
        k = scale.k_scalar(q, norm)
        assert scale.q_scalar(k, norm) == pytest.approx(float(scale.q(k, norm)), abs=1e-12)


@pytest.mark.parametrize("scale", ALL, ids=lambda s: s.name)
def test_max_size_positive(scale):
    norm = scale.normalizer(100, 1e6)
    qs = np.linspace(0.001, 0.999, 999)
    ms = np.asarray(scale.max_size(qs, norm))
    assert np.all(ms > 0)


@pytest.mark.parametrize("scale", BASE, ids=lambda s: s.name)
def test_max_size_symmetric(scale):
    # the four base scales have symmetric caps; glued variants are
    # asymmetric BY DESIGN (cheap low quantiles, accurate high quantiles)
    norm = scale.normalizer(100, 1e6)
    qs = np.linspace(0.001, 0.999, 999)
    ms = np.asarray(scale.max_size(qs, norm))
    assert np.allclose(ms, ms[::-1], rtol=1e-9)


def test_glued_asymmetry_and_continuity():
    """Glued scales: constant cap below the split, tighter cap at the top;
    k() is continuous at the split point."""
    for scale in (K_1_GLUED, K_2_GLUED, K_3_GLUED):
        norm = scale.normalizer(100, 1e6)
        assert scale.max_size(0.2, norm) == pytest.approx(
            scale.max_size(0.4, norm))
        assert scale.max_size(0.99, norm) < scale.max_size(0.3, norm)
        eps = 1e-9
        assert scale.k_scalar(0.5 - eps, norm) == pytest.approx(
            scale.k_scalar(0.5 + eps, norm), abs=1e-6)


def test_fast_asin_accuracy():
    """|fastAsin - asin| <= 1e-6 on [-1, 1] (ScaleFunctionTests.java:36-71)."""
    x = np.linspace(-1.0, 1.0, 20001)
    err = np.abs(fast_asin(x) - np.arcsin(x))
    assert err.max() <= 1e-6
    assert np.isnan(fast_asin(1.5))
    assert fast_asin(0.0) == 0.0


def test_no_norm_unbounded_centroids(rng):
    """NO_NORM variants grow centroid count ~ log(n) (documented trade-off;
    ScaleFunction.java:647-651) — more centroids than the normalized K_2."""
    from t_digest_ray.state.tdigest import TDigest

    data = rng.uniform(0, 1, 100_000)
    a = TDigest(100, K_2)
    b = TDigest(100, K_2_NO_NORM)
    a.update_batch(data)
    b.update_batch(data)
    a.compress()
    b.compress()
    assert b.centroid_count > a.centroid_count


@pytest.mark.parametrize("scale", EXTENDED, ids=lambda s: s.name)
def test_digest_accuracy_with_extended_scales(scale, rng):
    """Every variant yields a working digest within the streaming bound."""
    from t_digest_ray.state.tdigest import TDigest

    data = rng.uniform(0, 1, 30_000)
    d = TDigest(200, scale)
    d.update_batch(data)
    d.compress()
    s = np.sort(data)
    for q in [0.1, 0.5, 0.9, 0.99]:
        est = d.quantile(q)
        tr = np.searchsorted(s, est, side="right") / len(s)
        assert abs(tr - q) <= 0.02, f"{scale.name} q={q}"


@pytest.mark.parametrize("scale", [K_1, K_2, K_3], ids=lambda s: s.name)
def test_unit_k_step_matches_max_size(scale):
    """A unit k-step around q spans roughly max_size(q) of quantile space."""
    norm = scale.normalizer(100, 1e6)
    for q in [0.1, 0.3, 0.5, 0.7, 0.9]:
        k = scale.k_scalar(q, norm)
        span = scale.q_scalar(k + 0.5, norm) - scale.q_scalar(k - 0.5, norm)
        assert span == pytest.approx(scale.max_size(q, norm), rel=0.2)


def test_get_scale():
    assert get_scale("K_2") is K_2
    assert get_scale(K_1) is K_1
    with pytest.raises(KeyError):
        get_scale("K_9")
