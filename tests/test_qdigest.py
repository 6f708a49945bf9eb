"""q-digest unit tests — invariant, published rank bound, EXACT merge
determinism (the property that distinguishes it from the randomized /
order-sensitive sketches), and serde."""

import numpy as np
import pytest

from t_digest_ray.state.qdigest import QDigest


def _zipf(n, seed, a=1.4, cap=60_000):
    rng = np.random.default_rng(seed)
    return np.clip(rng.zipf(a, n), 0, cap).astype(np.int64)


def _rank_err(sorted_vals, est, q):
    n = len(sorted_vals)
    lo = np.searchsorted(sorted_vals, est, "left") / n
    hi = np.searchsorted(sorted_vals, est, "right") / n
    return max(q - hi, lo - q, 0.0)


QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def test_rank_bound_single_stream():
    data = _zipf(150_000, 11)
    sk = QDigest(k=512, log_universe=20)
    for chunk in np.array_split(data, 23):
        sk.update_batch(chunk)
    sv = np.sort(data)
    for q in QS:
        assert _rank_err(sv, sk.quantile(q), q) <= sk.eps


def test_rank_bound_after_two_level_merge():
    data = _zipf(120_000, 5)
    parts = np.array_split(data, 16)
    skparts = []
    for p in parts:
        s = QDigest(k=512, log_universe=20)
        s.update_batch(p)
        skparts.append(s)
    l1a = QDigest(k=512, log_universe=20).merge(*skparts[:8])
    l1b = QDigest(k=512, log_universe=20).merge(*skparts[8:])
    top = QDigest(k=512, log_universe=20).merge(l1a, l1b)
    assert top.n == len(data)
    sv = np.sort(data)
    for q in QS:
        assert _rank_err(sv, top.quantile(q), q) <= top.eps


def test_merge_exactly_order_independent():
    data = _zipf(50_000, 3)
    parts = np.array_split(data, 7)

    def build(order):
        sks = []
        for i in order:
            s = QDigest(k=256, log_universe=20)
            s.update_batch(parts[i])
            sks.append(s)
        return QDigest(k=256, log_universe=20).merge(*sks)

    a = build(range(7))
    b = build(reversed(range(7)))
    assert (a.ids == b.ids).all() and (a.counts == b.counts).all()
    assert a.to_bytes() == b.to_bytes()


def test_invariant_node_counts_bounded():
    data = _zipf(80_000, 9)
    sk = QDigest(k=128, log_universe=20)
    sk.update_batch(data)
    thresh = sk.n // sk.k
    leaf_lo = np.int64(1) << np.int64(sk.L)
    internal = sk.ids < leaf_lo
    # every stored internal node obeys count <= floor(n/k)
    assert (sk.counts[internal] <= thresh).all()
    # sparse size stays O(k * L)
    assert len(sk.ids) <= 3 * sk.k * sk.L


def test_min_max_and_clipping():
    sk = QDigest(k=64, log_universe=8)  # universe [0, 256)
    sk.update_batch(np.array([1000, -5, 42], dtype=np.int64))
    assert sk.min == -5 and sk.max == 1000
    # quantile is clamped to the exact observed range
    assert -5 <= sk.quantile(0.0) <= 1000
    assert sk.quantile(1.0) <= 1000


def test_cdf_and_rank():
    data = np.arange(1, 10_001, dtype=np.int64)
    sk = QDigest(k=1024, log_universe=16)
    sk.update_batch(data)
    for x in (100, 5000, 9999):
        assert abs(sk.cdf(x) - x / 10_000) <= sk.eps


def test_serde_roundtrip_and_empty():
    sk = QDigest(k=512, log_universe=20)
    sk.update_batch(_zipf(10_000, 1))
    r = QDigest.from_bytes(sk.to_bytes())
    assert r.n == sk.n and (r.ids == sk.ids).all()
    assert r.quantile(0.5) == sk.quantile(0.5)
    empty = QDigest.from_bytes(QDigest(k=4, log_universe=10).to_bytes())
    assert empty.n == 0 and np.isnan(empty.quantile(0.5))


def test_weighted_updates():
    sk = QDigest(k=256, log_universe=12)
    sk.update_batch(np.array([1, 2, 3]), weights=np.array([5, 3, 2]))
    assert sk.n == 10
    assert sk.quantile(0.3) == 1.0


def test_param_mismatch_raises():
    a = QDigest(k=64, log_universe=12)
    b = QDigest(k=64, log_universe=14)
    with pytest.raises(ValueError):
        a.merge(b)
