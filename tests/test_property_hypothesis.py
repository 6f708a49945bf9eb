"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the seeded fixtures — weight conservation, quantile
monotonicity and range, merge equivalence, serde round trips."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from t_digest_ray.state.kll import KllSketch
from t_digest_ray.state.req import ReqSketch
from t_digest_ray.state.tdigest import TDigest

finite = st.floats(min_value=-1e12, max_value=1e12,
                   allow_nan=False, allow_infinity=False)
values = arrays(np.float64, st.integers(1, 400), elements=finite)


@settings(max_examples=40, deadline=None)
@given(values)
def test_tdigest_weight_and_range(v):
    d = TDigest(50)
    d.update_batch(v)
    d.compress()
    assert d.size == len(v)
    m, w = d.centroids()
    assert w.sum() == len(v)
    assert np.all(np.diff(m) >= 0)
    assert d.min == v.min() and d.max == v.max()
    qs = np.linspace(0, 1, 11)
    est = d.quantile_batch(qs)
    assert np.all(np.diff(est) >= -1e-9), "quantiles must be monotone"
    assert est[0] >= v.min() - 1e-9 and est[-1] <= v.max() + 1e-9


@settings(max_examples=25, deadline=None)
@given(values, st.integers(2, 6))
def test_tdigest_split_merge_equals_whole_weight(v, parts):
    subs = []
    for p in np.array_split(v, parts):
        d = TDigest(50)
        if len(p):
            d.update_batch(p)
        subs.append(d)
    merged = TDigest(50).merge(*subs)
    assert merged.size == len(v)
    if len(v):
        assert merged.min == v.min() and merged.max == v.max()


@settings(max_examples=25, deadline=None)
@given(values)
def test_tdigest_serde_identity(v):
    d = TDigest(50)
    d.update_batch(v)
    d.compress()
    d2 = TDigest.from_bytes(d.to_bytes())
    assert np.array_equal(d.quantile_batch(np.linspace(0, 1, 7)),
                          d2.quantile_batch(np.linspace(0, 1, 7)))


@settings(max_examples=25, deadline=None)
@given(values)
def test_kll_rank_bounds(v):
    sk = KllSketch(200)
    sk.update_batch(v)
    assert sk.n == len(v)
    s = np.sort(v)
    for q in (0.0, 0.5, 1.0):
        est = sk.quantile(q)
        assert s[0] <= est <= s[-1]
    # rank of min is at most eps; rank of max is ~1
    assert sk.rank(s[-1] + 1.0) == 1.0


@settings(max_examples=25, deadline=None)
@given(values)
def test_req_count_and_top_rank(v):
    sk = ReqSketch(k=12)
    sk.update_batch(v)
    assert sk.n == len(v)
    s = np.sort(v)
    assert sk.quantile(1.0) == s[-1]  # hra keeps the top exactly
    assert sk.min == s[0] and sk.max == s[-1]


@settings(max_examples=20, deadline=None)
@given(values, values)
def test_merge_commutative_weight(a, b):
    da, db = TDigest(50), TDigest(50)
    da.update_batch(a)
    db.update_batch(b)
    ab = TDigest(50).merge(TDigest.from_bytes(da.to_bytes()),
                           TDigest.from_bytes(db.to_bytes()))
    ba = TDigest(50).merge(TDigest.from_bytes(db.to_bytes()),
                           TDigest.from_bytes(da.to_bytes()))
    assert ab.size == ba.size == len(a) + len(b)
    # canonical merge: same centroids regardless of argument order
    ma, wa = ab.centroids()
    mb, wb = ba.centroids()
    assert np.array_equal(ma, mb) and np.array_equal(wa, wb)


def test_bpe_token_count_segments():
    """BPE-ish pre-tokenizer counts (contractions, space-prefixed word/
    digit runs, punctuation runs, residual whitespace)."""
    import pandas as pd

    from t_digest_ray.functions.text import bpe_token_count

    s = pd.Series(["I'll say don't, twice!", "abc123 def", None, ""])
    assert bpe_token_count(s).tolist() == [8, 3, 0, 0]


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=50, unique=True))
def test_splitmix64_sql_parity(ids):
    """The samplers' oracle trick: splitmix64 reproduced in DuckDB via
    UHUGEINT arithmetic must match the numpy kernel bit-exactly for any
    uint64 input (this is what makes the 'random' sampling queries
    value-hash checkable)."""
    import duckdb

    from t_digest_ray.functions.hashing import splitmix64

    want = splitmix64(np.array(ids, dtype=np.uint64))
    vals = ", ".join(f"({i})" for i in ids)
    m64 = "CAST(18446744073709551616 AS UHUGEINT)"
    got = duckdb.sql(f"""
        WITH ids(x) AS (SELECT * FROM (VALUES {vals}) t(x)),
        s0 AS (SELECT x, (CAST(x AS UHUGEINT)
                          + CAST(11400714819323198485 AS UHUGEINT))
                          % {m64} AS z FROM ids),
        s1 AS (SELECT x, (xor(z, z >> 30)
                          * CAST(13787848793156543929 AS UHUGEINT))
                          % {m64} AS z FROM s0),
        s2 AS (SELECT x, (xor(z, z >> 27)
                          * CAST(10723151780598845931 AS UHUGEINT))
                          % {m64} AS z FROM s1)
        SELECT x, xor(z, z >> 31) FROM s2
    """).fetchall()
    got_map = {int(x): int(h) for x, h in got}
    want_map = {int(i): int(w) for i, w in zip(ids, want)}
    assert got_map == want_map


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=5),
                          st.integers(min_value=-100, max_value=100),
                          st.integers(min_value=0, max_value=10**6)),
                min_size=1, max_size=120),
       st.integers(min_value=1, max_value=6))
def test_head_k_per_run_matches_pandas(rows, k):
    """The shared top-k kernel (stratified_sample / topk_per_key) equals
    pandas sort+head for any (key, value, id) multiset."""
    import pandas as pd

    from t_digest_ray.pipelines.curation import _head_k_per_run

    keys = np.array([r[0] for r in rows], dtype=np.int64)
    vals = np.array([r[1] for r in rows], dtype=np.int64)
    ids = np.array([r[2] for r in rows], dtype=np.int64)
    take = _head_k_per_run((ids, vals, keys), keys, k)
    got = sorted(zip(keys[take], vals[take], ids[take]))
    want = sorted(map(tuple, pd.DataFrame({"k": keys, "v": vals, "i": ids})
                      .sort_values(["k", "v", "i"]).groupby("k").head(k)
                      .itertuples(index=False)))
    assert got == want


@settings(max_examples=60, deadline=None)
@given(arrays(np.int64, st.integers(0, 120),
              elements=st.integers(0, 50)),
       st.integers(1, 40))
def test_fresh_pack_summary_matches_sequential(w, budget):
    """Binary-lifting fresh-pack DP == the naive sequential scan for EVERY
    suffix start, any weights (zeros and oversize included)."""
    from t_digest_ray.pipelines.curation import (_fresh_pack_summary,
                                                 _pack_jump)

    P = np.concatenate(([np.int64(0)], np.cumsum(w)))
    K, last = _fresh_pack_summary(P, budget)
    m = len(w)

    def seq_fresh(i):
        # pack w[i:] starting a new empty shard; oversize -> singleton
        shards, fill, start, pos = 0, 0, i, i
        if i == m:
            return 0, i
        shards, fill, start = 1, 0, i
        for j in range(i, m):
            wj = int(w[j])
            if j > i and (fill + wj > budget or w[start] > budget):
                shards += 1
                start = j
                fill = wj
            else:
                fill += wj
        return shards, start

    for i in range(m + 1):
        ks, ls = seq_fresh(i)
        assert K[i] == ks, (i, list(w), budget)
        if i < m:
            assert last[i] == ls, (i, list(w), budget)
    # jump sanity: a fresh shard never exceeds budget unless singleton
    if m:
        e = _pack_jump(P, budget)
        for i in range(m):
            if e[i] > i + 1:
                assert P[e[i]] - P[i] <= budget


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["aa", "b", "ccc", "dd", ""]),
                         min_size=0, max_size=12),
                min_size=1, max_size=8),
       st.integers(2, 4))
def test_word_gram_hashes_match_python_reference(docs_tokens, n):
    """Gram extraction must equal the obvious per-doc Python loop for
    ANY token layout (empties dropped, boundaries never straddled)."""
    import pyarrow as pa

    from t_digest_ray.functions.hashing import hash64
    from t_digest_ray.pipelines.textstats import _word_gram_hashes

    texts = [" ".join(toks) for toks in docs_tokens]
    h, doc_of = _word_gram_hashes(pa.array(texts, type=pa.string()), n)

    want_pairs = []
    for i, toks in enumerate(docs_tokens):
        toks = [t for t in toks if t]
        for j in range(len(toks) - n + 1):
            want_pairs.append((i, " ".join(toks[j:j + n])))
    got = sorted(zip(doc_of.tolist(), h.tolist()))
    want = sorted((i, int(hash64(np.array([g], dtype=object))[0]))
                  for i, g in want_pairs)
    assert got == want


@settings(max_examples=30, deadline=None)
@given(values, st.floats(min_value=0.05, max_value=0.95))
def test_kllpm_pure_inserts_equals_plain_kll(v, q):
    """With no deletions KLL± must degenerate to the base KLL exactly
    (same seed, same stream -> same retained items -> same answer)."""
    from t_digest_ray.state.kllpm import KllPM

    base = KllSketch(200)
    base.update_batch(v)
    pm = KllPM(200)
    pm.update_batch(v)
    assert pm.size == base.n
    assert pm.quantile(q) == base.quantile(q)


@settings(max_examples=60, deadline=None)
@given(arrays(np.int64, st.integers(1, 120),
              elements=st.integers(0, 12)),
       arrays(np.int64, st.integers(1, 120),
              elements=st.integers(0, 12)))
def test_frontier_mask_properties(x, y):
    """Frontier invariants for ANY point set: non-empty, contains the
    max-x and max-y points, survivors mutually non-dominating, and
    merge-equivalence (frontier of frontiers == frontier of union)."""
    from t_digest_ray.pipelines.stats import _frontier_mask

    n = min(len(x), len(y))
    x, y = x[:n].astype(float), y[:n].astype(float)
    m = _frontier_mask(x, y)
    assert m.any()
    # the lexicographic (x, y) max point always survives
    best = np.lexsort((y, x))[-1]
    assert m[best]
    fx, fy = x[m], y[m]
    for i in range(len(fx)):
        dom = ((fx >= fx[i]) & (fy >= fy[i])
               & ((fx > fx[i]) | (fy > fy[i])))
        assert not dom.any()
    # mergeability
    h = n // 2
    ka, kb = _frontier_mask(x[:h], y[:h]), _frontier_mask(x[h:], y[h:])
    ux = np.concatenate([x[:h][ka], x[h:][kb]])
    uy = np.concatenate([y[:h][ka], y[h:][kb]])
    whole = sorted(zip(x[m], y[m]))
    merged = sorted(zip(ux[_frontier_mask(ux, uy)],
                        uy[_frontier_mask(ux, uy)]))
    assert whole == merged


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abc", max_size=7),
       st.text(alphabet="abc", max_size=7))
def test_within_one_edit_matches_dp_any_strings(a, b):
    from t_digest_ray.stages.fuzzy import within_one_edit

    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    assert within_one_edit(a, b) == (prev[-1] == 1)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abcd", min_size=0, max_size=8),
       st.text(alphabet="abcd", min_size=0, max_size=8))
def test_deletion_blocking_complete_any_pair(a, b):
    """Any distance-1 pair shares a deletion variant (SymSpell
    completeness) — for arbitrary strings, not just fixtures."""
    from t_digest_ray.stages.fuzzy import _deletion_variants

    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    if prev[-1] == 1:
        assert set(_deletion_variants(a)) & set(_deletion_variants(b))


@settings(max_examples=40, deadline=None)
@given(arrays(np.int64, st.integers(2, 200),
              elements=st.integers(0, 50)))
def test_gini_range_and_translation(cents):
    """Gini of any non-negative sample lies in [0, 1); equal values give
    exactly 0; scaling by a positive constant leaves it unchanged."""
    from tests.test_analytics_ops import brute_gini

    if cents.sum() == 0:
        return
    g = brute_gini(cents)
    assert 0.0 <= g < 1.0
    assert abs(brute_gini(cents * 3) - g) < 1e-12
    eq = np.full(len(cents), 7)
    assert brute_gini(eq) == 0.0


# ---------------------------------------------------------- selection kernels


@settings(max_examples=200, deadline=None)
@given(st.integers(-10**9, 10**9), st.integers(1, 10**9),
       st.integers(2, 512))
def test_selection_bin_inversion_identity(lo, width, n_bins):
    """The closed forms v_lo = lo + ceil(j·w/B) and
    v_hi = lo + ceil((j+1)·w/B) − 1 exactly characterize
    {v : ((v−lo)·B)//w == j} — the invariant the narrowing loop and
    the final exact-value resolution both rest on."""
    hi = lo + width - 1
    # probe a handful of values across the range
    probes = np.unique(np.clip(
        lo + np.array([0, 1, width // 3, width // 2, width - 1]),
        lo, hi))
    for v in probes:
        j = int(((int(v) - lo) * n_bins) // width)
        v_lo = lo + (j * width + n_bins - 1) // n_bins
        v_hi = lo + ((j + 1) * width - 1) // n_bins
        assert v_lo <= v <= v_hi
        # boundary values map outside bin j
        if v_lo - 1 >= lo:
            assert ((v_lo - 1 - lo) * n_bins) // width < j
        if v_hi + 1 <= hi:
            assert ((v_hi + 1 - lo) * n_bins) // width > j


@settings(max_examples=100, deadline=None)
@given(arrays(np.int64, st.integers(1, 60),
              elements=st.integers(0, 1000)),
       arrays(np.int64, st.integers(1, 60),
              elements=st.integers(0, 9)),
       st.tuples(st.integers(1, 99), st.just(100)))
def test_weighted_rank_rule_matches_cumsum(vals, wts, q):
    """smallest v with den·cumw(≤v) ≥ num·W  ==  the value at rank
    ceil(num·W/den) in the weight-expanded multiset (zero-weight
    values can never be the answer unless the whole mass is zero)."""
    n = min(len(vals), len(wts))
    vals, wts = vals[:n], wts[:n]
    W = int(wts.sum())
    if W == 0:
        return
    num, den = q
    order = np.argsort(vals, kind="stable")
    v_sorted, w_sorted = vals[order], wts[order]
    cw = np.cumsum(w_sorted)
    rule = int(v_sorted[np.argmax(den * cw >= num * W)])
    expanded = np.repeat(v_sorted, w_sorted)
    target = max(-(-num * W // den), 1)          # ceil
    oracle = int(expanded[target - 1])
    assert rule == oracle
