"""IIDgenerator-port conformance: per-rank error envelopes of all three
quantile sketches stay within the reference's tested bounds
(TDigestTest.java:601-610 cdf<=0.08; KllDoublesSketch.java:534-538
eps=2.296/k^0.9723; ReqSketch.java:79 relRseFactor)."""

from __future__ import annotations

import numpy as np
import pytest

from t_digest_ray.pipelines.accuracy import accuracy_experiment, generate


def test_generators_deterministic():
    for d in ("uniform", "normal", "exponential", "loguniform",
              "loguniform2", "clustered"):
        a = generate(d, 1000, 7)
        b = generate(d, 1000, 7)
        assert np.array_equal(a, b)
        assert len(a) == 1000 and np.isfinite(a).all()
    with pytest.raises(ValueError):
        generate("nope", 10, 0)


@pytest.fixture(scope="module")
def uniform_result(ray_session):
    return accuracy_experiment(
        dist="uniform", n=1 << 15, trials=8, n_ranks=21,
        compression=100, kll_k=200, req_k=12).to_pandas()


def test_tdigest_envelope(uniform_result):
    td = uniform_result[uniform_result["sketch"] == "tdigest"]
    assert len(td) == 21
    # streaming cdf bound of the reference test harness
    assert td["err_max"].abs().max() <= 0.08
    # 95% envelope is much tighter mid-range
    assert td["err_hi"].abs().max() <= 0.02
    assert td["err_lo"].abs().max() <= 0.02
    # extreme ranks are near-exact for t-digest
    tails = td[(td["rank"] <= 0.01) | (td["rank"] >= 0.99)]
    assert tails["err_max"].abs().max() <= 0.005


def test_kll_envelope(uniform_result):
    kll = uniform_result[uniform_result["sketch"] == "kll"]
    eps = 2.296 / 200 ** 0.9723
    assert kll["err_hi"].abs().max() <= 3 * eps
    assert kll["err_lo"].abs().max() <= 3 * eps


def test_req_envelope(uniform_result):
    req = uniform_result[uniform_result["sketch"] == "req"]
    # hra: error shrinks toward high ranks; top rank essentially exact
    top = req[req["rank"] >= 0.95]
    assert top["err_max"].abs().max() <= 1e-3
    assert req["err_hi"].abs().max() <= 0.06
    assert req["err_lo"].abs().max() <= 0.06


def test_error_within_cluster_width_bound(rng):
    """Layer-4 theoretical bound (SURVEY.md §5): the cdf error at any rank
    is bounded by the local max cluster width scale.max_size(q) — each probe
    falls inside at most one centroid whose quantile span the scale function
    caps (the O(1/δ)-style argument of Dunning's paper)."""
    from t_digest_ray.state.scale_functions import K_2
    from t_digest_ray.state.tdigest import TDigest

    n = 100_000
    data = rng.uniform(0, 1, n)
    d = TDigest(100)
    for c in np.array_split(data, 16):
        d.update_batch(c)
    d.compress()
    s = np.sort(data)
    norm = K_2.normalizer(100, n)
    qs = np.linspace(0.001, 0.999, 199)
    probes = s[(qs * (n - 1)).astype(np.int64)]
    est = d.cdf_batch(probes)
    lo = np.searchsorted(s, probes, side="left") / n
    hi = np.searchsorted(s, probes, side="right") / n
    err = np.abs(np.where(est < lo, est - lo,
                          np.where(est > hi, est - hi, 0.0)))
    bound = np.asarray(K_2.max_size(qs, norm))
    assert np.all(err <= bound + 1e-12), \
        f"violations at q={qs[err > bound]}"


def test_heavy_tail_distribution(ray_session):
    out = accuracy_experiment(
        dist="loguniform", n=1 << 14, trials=4, n_ranks=11,
        compression=100).to_pandas()
    td = out[out["sketch"] == "tdigest"]
    assert td["err_max"].abs().max() <= 0.08


def test_kllpm_turnstile_envelope(ray_session):
    """KLL± error envelope over the NET distribution with 25% deletions:
    bounded by the paper's n_abs/n_net-scaled KLL rank error."""
    from t_digest_ray.state.kll import KllSketch

    out = accuracy_experiment(
        dist="uniform", n=1 << 15, trials=6, n_ranks=21,
        compression=100, kll_k=200, req_k=12,
        turnstile_frac=0.25).to_pandas()
    pm = out[out["sketch"] == "kllpm"]
    assert len(pm) == 21
    # n_abs/n_net = 1.25/0.75 ~ 1.67; published kll nre ~ 1.3% at k=200
    bound = KllSketch.normalized_rank_error(200) * (1.25 / 0.75)
    assert pm["err_max"].abs().max() <= 2.0 * bound
    assert pm["err_hi"].abs().max() <= bound
    assert pm["err_lo"].abs().max() <= bound


def test_ddsketch_relative_error_envelope(ray_session):
    """DDSketch leg: every probe's VALUE-relative error stays within
    alpha — the paper's deterministic guarantee, so err_max (not just
    the 95% band) must respect it across all trials."""
    out = accuracy_experiment(
        dist="loguniform", n=1 << 14, trials=4, n_ranks=21,
        compression=100, ddsketch_alpha=0.01).to_pandas()
    dd = out[out["sketch"] == "ddsketch"]
    assert len(dd) == 21
    assert dd["err_max"].abs().max() <= 0.01 + 1e-9
