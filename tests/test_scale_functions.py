"""Layer-1 property tests on scale functions.

Mirrors the reference's ScaleFunctionTests.java:171-262 (k/q inverse
round-trip, monotonicity, non-negative max sizes) without porting code.
"""

import numpy as np
import pytest

from t_digest_ray.state.scale_functions import K_0, K_1, K_2, K_3, get_scale

ALL = [K_0, K_1, K_2, K_3]


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
def test_max_size_positive_and_symmetric(scale):
    norm = scale.normalizer(100, 1e6)
    qs = np.linspace(0.001, 0.999, 999)
    ms = np.asarray(scale.max_size(qs, norm))
    assert np.all(ms > 0)
    # all four base scales have symmetric cluster-size caps
    assert np.allclose(ms, ms[::-1], rtol=1e-9)


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
