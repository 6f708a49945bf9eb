"""ReqSketch: relative-error quantiles (reference ReqSketch.java semantics;
error bound relRseFactor = sqrt(0.0512/3)/k scaled by (1-rank) for hra)."""

from __future__ import annotations

import numpy as np
import pytest

from t_digest_ray.state.req import ReqSketch


def true_rank(sorted_data: np.ndarray, x: float) -> float:
    return np.searchsorted(sorted_data, x, side="right") / len(sorted_data)


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "sequential"])
def test_rank_error_within_bound(dist, rng):
    n = 100_000
    if dist == "uniform":
        data = rng.uniform(0, 1, n)
    elif dist == "lognormal":
        data = rng.lognormal(5, 1.5, n)
    else:
        data = np.arange(n, dtype=np.float64)
    sk = ReqSketch(k=12, hra=True)
    for chunk in np.array_split(data, 23):
        sk.update_batch(chunk)
    s = np.sort(data)
    for q in [0.01, 0.1, 0.5, 0.9, 0.99, 0.999, 0.9999]:
        est = sk.quantile(q)
        err = abs(true_rank(s, est) - q)
        # 4 std dev of the hra relative bound, floor for the low-rank end
        bound = max(4 * sk.rank_rse(q), 0.025)
        assert err <= bound, f"{dist} q={q}: err {err} > {bound}"


def test_high_ranks_sharper_than_low(rng):
    """hra=True concentrates accuracy at high ranks (retains high-rank
    items exactly: the top of the sketch is lossless)."""
    data = rng.uniform(0, 1, 200_000)
    sk = ReqSketch(k=12, hra=True)
    sk.update_batch(data)
    s = np.sort(data)
    hi_err = abs(true_rank(s, sk.quantile(0.9999)) - 0.9999)
    assert hi_err <= 2e-4


def test_merge_matches_single_pass(rng):
    data = rng.lognormal(4, 1, 100_000)
    s = np.sort(data)
    for n_parts in (2, 10, 50):
        parts = np.array_split(data, n_parts)
        sketches = []
        for i, p in enumerate(parts):
            sk = ReqSketch(k=12, seed=7 + i)
            sk.update_batch(p)
            sketches.append(sk)
        merged = ReqSketch(k=12).merge(*sketches)
        assert merged.n == len(data)
        for q in [0.5, 0.9, 0.99, 0.999]:
            err = abs(true_rank(s, merged.quantile(q)) - q)
            assert err <= max(4 * merged.rank_rse(q), 0.03), \
                f"parts={n_parts} q={q}: {err}"


def test_merge_order_invariance(rng):
    """Associativity within determinism of the seeded schedule: merging the
    same parts in different orders gives rank estimates within bound of
    each other."""
    data = rng.uniform(0, 100, 50_000)
    parts = np.array_split(data, 8)
    sketches = [ReqSketch(k=24, seed=i) for i in range(8)]
    for sk, p in zip(sketches, parts):
        sk.update_batch(p)
    blobs = [sk.to_bytes() for sk in sketches]
    a = ReqSketch(k=24).merge(*[ReqSketch.from_bytes(b) for b in blobs])
    b = ReqSketch(k=24).merge(
        *[ReqSketch.from_bytes(x) for x in reversed(blobs)])
    for q in [0.1, 0.5, 0.9, 0.99]:
        assert abs(a.quantile(q) - b.quantile(q)) <= \
            (a.quantile(min(q + 0.02, 1.0)) - a.quantile(max(q - 0.02, 0.0))
             + 1e-9)


def test_serde_roundtrip(rng):
    sk = ReqSketch(k=12)
    sk.update_batch(rng.uniform(0, 1, 10_000))
    b = sk.to_bytes()
    sk2 = ReqSketch.from_bytes(b)
    assert sk2.to_bytes() == b
    assert sk2.n == sk.n and sk2.min == sk.min and sk2.max == sk.max
    qs = np.linspace(0, 1, 21)
    assert np.array_equal(sk.quantile_batch(qs), sk2.quantile_batch(qs))


def test_empty_and_nan():
    sk = ReqSketch(k=12)
    assert np.isnan(sk.quantile(0.5))
    sk.update_batch([np.nan, np.nan])
    assert sk.n == 0
    sk.update_batch([1.0, np.nan, 3.0])
    assert sk.n == 2 and sk.min == 1.0 and sk.max == 3.0


def test_weights_repeat():
    sk = ReqSketch(k=12)
    sk.update_batch([1.0, 2.0], weights=[3, 1])
    assert sk.n == 4
    assert sk.quantile(0.5) == 1.0


def test_weights_stay_paired_after_nan_filter():
    """NaN removal must drop the matching weight too (regression: the
    weight of a NaN value was applied to the next value)."""
    sk = ReqSketch(k=12)
    sk.update_batch([1.0, np.nan, 3.0], weights=[2, 5, 4])
    assert sk.n == 6
    assert sk.quantile(0.0) == 1.0 and sk.quantile(1.0) == 3.0


def test_k_validation():
    with pytest.raises(ValueError):
        ReqSketch(k=13)
    with pytest.raises(ValueError):
        ReqSketch(k=2)


def test_exact_when_small(rng):
    """Below one compactor's capacity the sketch is lossless."""
    data = rng.uniform(0, 1, 50)
    sk = ReqSketch(k=12)
    sk.update_batch(data)
    s = np.sort(data)
    for q in [0.0, 0.25, 0.5, 0.75, 1.0]:
        est = sk.quantile(q)
        assert est in data
        assert abs(true_rank(s, est) - q) <= 1.0 / len(data) + 1e-9


def test_fractional_weights_rejected():
    """Fractional weights have no rank-sketch meaning; silently flooring
    them would drop/undercount values, so they must raise (ADVICE r01)."""
    sk = ReqSketch(k=12)
    with pytest.raises(ValueError, match="integer weights"):
        sk.update_batch([1.0, 2.0], weights=[0.9, 2.7])
    assert sk.n == 0


def test_req_datasketches_layout_roundtrip():
    """ReqSerDe layout parity (ReqSerDe.java:38-130): all four formats
    round-trip; header fields verified by hand-unpacking."""
    import struct

    from t_digest_ray.state.req import req_from_java_bytes, req_to_java_bytes

    # EMPTY
    e = ReqSketch(k=12)
    be = req_to_java_bytes(e)
    assert len(be) == 8
    pre, ver, fam, flags, k, nc, nr = struct.unpack_from("<BBBBHBB", be, 0)
    assert (pre, ver, fam, k, nc, nr) == (2, 1, 17, 12, 0, 0)
    assert flags & 4 and flags & 8  # empty + hra
    assert req_from_java_bytes(be).n == 0

    # RAWITEMS (n <= 4)
    r = ReqSketch(k=12)
    r.update_batch([3.0, 1.0, 2.0])
    br = req_to_java_bytes(r)
    assert struct.unpack_from("<BBBBHBB", br, 0)[6] == 3
    r2 = req_from_java_bytes(br)
    assert r2.n == 3 and r2.min == 1.0 and r2.max == 3.0

    # EXACT (one compactor) and ESTIMATION (many)
    rng = np.random.default_rng(4)
    for n_vals, want_pre in ((20, 2), (20000, 4)):
        sk = ReqSketch(k=12)
        sk.update_batch(rng.uniform(0, 100, n_vals))
        b = req_to_java_bytes(sk)
        assert struct.unpack_from("<B", b, 0)[0] == want_pre
        sk2 = req_from_java_bytes(b)
        assert sk2.n == sk.n and sk2.min == sk.min and sk2.max == sk.max
        assert len(sk2.compactors) == len(sk.compactors)
        for c1, c2 in zip(sk.compactors, sk2.compactors):
            assert np.array_equal(np.sort(c1.items), np.sort(c2.items))
            assert (c1.state, c1.num_sections, c1.lg_weight) == \
                   (c2.state, c2.num_sections, c2.lg_weight)
        for q in (0.1, 0.5, 0.9, 0.99):
            assert sk2.quantile(q) == sk.quantile(q)
