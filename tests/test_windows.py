"""Temporal operators: tumbling/sliding windows, as-of join, sessionization
on planted sequences with hand-computable answers, plus parallelism
invariance (the value-hash oracle parity runs in scripts/check_correctness)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from t_digest_ray.pipelines.windows import (asof_join, sessionize,
                                            sliding_window, tumbling_window)

US = 1_000_000


def _events(rows):
    """rows: (event_id, user, t_seconds float, kind)."""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "ts": pa.array([int(r[2] * US) for r in rows],
                       type=pa.int64()).cast(pa.timestamp("us")),
        "kind": pa.array([r[3] for r in rows]),
    })
    import ray
    return ray.data.from_arrow(t)


def test_tumbling_window_counts(ray_session):
    ds = _events([(1, 1, 10, "a"), (2, 1, 50, "a"), (3, 1, 70, "b"),
                  (4, 2, 130, "a")])
    out = tumbling_window(ds, "ts", 60).to_pandas() \
        .set_index("window_start_s")["cnt"]
    assert out.to_dict() == {0: 2, 60: 1, 120: 1}


def test_sliding_window_membership(ray_session):
    # size 120, step 60: event at t=70 belongs to windows starting 0 and 60
    ds = _events([(1, 1, 70, "a")])
    out = sliding_window(ds, "ts", size_s=120, step_s=60).to_pandas()
    assert set(out["window_start_s"]) == {0, 60}
    assert (out["cnt"] == 1).all()
    # boundary: event exactly at window start belongs to [start, start+size)
    ds2 = _events([(1, 1, 120, "a")])
    out2 = sliding_window(ds2, "ts", size_s=120, step_s=60).to_pandas()
    assert set(out2["window_start_s"]) == {60, 120}


def test_asof_join_planted(ray_session):
    rows = [
        # user 1: clicks at 10, 100; purchases at 50, 100, 5
        (101, 1, 10.0, "click"), (102, 1, 100.0, "click"),
        (201, 1, 50.0, "purchase"), (202, 1, 100.0, "purchase"),
        (203, 1, 5.0, "purchase"),
        # user 2: purchase with no prior click
        (204, 2, 60.0, "purchase"), (103, 2, 70.0, "click"),
    ]
    ds = _events(rows)

    def kind(k):
        import pyarrow.compute as pc
        return lambda b: b.filter(pc.equal(b["kind"], k))

    left = ds.map_batches(kind("purchase"), batch_format="pyarrow")
    right = ds.map_batches(kind("click"), batch_format="pyarrow")
    out = asof_join(left, right, "user_id", "ts",
                    "event_id", "event_id").to_pandas() \
        .set_index("event_id").sort_index()
    # purchase 201 (t=50) -> click 101 (t=10); purchase 202 (t=100) ->
    # click 102 (tie at same ts qualifies); purchase 203 (t=5) and
    # user-2 purchase 204 have no prior click -> dropped
    assert out.index.tolist() == [201, 202]
    assert out.loc[201, "prior_id"] == 101 and out.loc[201, "gap_s"] == 40
    assert out.loc[202, "prior_id"] == 102 and out.loc[202, "gap_s"] == 0


def test_sessionize_gap_rule(ray_session):
    rows = [(i, 1, t, "x") for i, t in enumerate([0, 10, 20, 2000, 2010])]
    rows += [(10, 2, 0.0, "x")]
    ds = _events(rows)
    out = sessionize(ds, "user_id", "ts", gap_s=1800).to_pandas() \
        .set_index("user_id")["n_sessions"]
    assert out.to_dict() == {1: 2, 2: 1}
    # exactly-at-gap does NOT start a new session (strict >)
    ds2 = _events([(1, 1, 0, "x"), (2, 1, 1800, "x")])
    out2 = sessionize(ds2, "user_id", "ts", gap_s=1800).to_pandas()
    assert out2["n_sessions"].iloc[0] == 1


def test_asof_parallelism_invariant(ray_session, rng):
    """Same result at different partition counts (the co-partitioning
    assumption holds by construction)."""
    import ray

    n = 2000
    t = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(rng.integers(0, 50, n), type=pa.int64()),
        "ts": pa.array(rng.integers(0, 10**9, n),
                       type=pa.int64()).cast(pa.timestamp("us")),
        "kind": pa.array(rng.choice(["l", "r"], n)),
    })
    results = []
    for parts in (2, 11):
        ds = ray.data.from_arrow(t).repartition(parts)
        import pyarrow.compute as pc
        left = ds.map_batches(
            lambda b: b.filter(pc.equal(b["kind"], "l")),
            batch_format="pyarrow")
        right = ds.map_batches(
            lambda b: b.filter(pc.equal(b["kind"], "r")),
            batch_format="pyarrow")
        out = asof_join(left, right, "user_id", "ts",
                        "event_id", "event_id").to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        results.append(out)
    pd.testing.assert_frame_equal(results[0], results[1])


def test_watermark_flags_planted(ray_session):
    """Planted out-of-order arrivals: the strictly-preceding running-max
    watermark flags exactly the events more than lateness behind it, at
    any parallelism and bucket count."""
    import ray

    from t_digest_ray.pipelines.windows import watermark_flags

    # arrival order 0..9; event times in seconds (us timestamps);
    # event at arrival 3 is 100s behind the max(t0..t2)=200 -> late at 60
    t = [100, 150, 200, 100, 210, 50, 220, 219, 230, 160]
    df = pd.DataFrame({
        "arr": np.arange(10, dtype=np.int64),
        "ts": pd.to_datetime(np.asarray(t, dtype=np.int64) * 1_000_000_000),
        "tag": list("abcdefghij"),
    })
    # reference: strictly-preceding running max
    wm = [-np.inf] + list(np.maximum.accumulate(t)[:-1])
    expect = [ti >= w - 60 for ti, w in zip(t, wm)]

    for parts, nb in ((1, 1), (3, 4), (10, 7)):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = (watermark_flags(ds, "ts", "arr", lateness_s=60,
                               carry_cols=("tag",), n_buckets=nb)
               .to_pandas().sort_values("arr"))
        assert out["on_time"].tolist() == expect, (parts, nb)
        assert out["tag"].tolist() == list("abcdefghij")


def test_watermark_flags_order_range_param(ray_session):
    """Passing the known arrival range skips the pre-pass and yields the
    same flags."""
    import ray

    from t_digest_ray.pipelines.windows import watermark_flags

    t = [100, 150, 200, 100, 210]
    df = pd.DataFrame({
        "arr": np.arange(5, dtype=np.int64),
        "ts": pd.to_datetime(np.asarray(t, dtype=np.int64) * 1_000_000_000),
    })
    ds = ray.data.from_pandas(df).repartition(2)
    a = (watermark_flags(ds, "ts", "arr", lateness_s=60, n_buckets=3)
         .to_pandas().sort_values("arr")["on_time"].tolist())
    b = (watermark_flags(ds, "ts", "arr", lateness_s=60, n_buckets=3,
                         order_range=(0, 4))
         .to_pandas().sort_values("arr")["on_time"].tolist())
    assert a == b


def test_watermarked_window_split_planted(ray_session):
    """Planted window-close scenario: an event arriving after the
    watermark passed its window end + lateness is dropped; late-but-
    within-lateness and in-order events are accepted. Identical at any
    bucket count."""
    import ray

    from t_digest_ray.pipelines.windows import watermarked_window_split

    # window_s=10, lateness=2. Arrival order = arr. Event times:
    #  arr: 0  1  2   3   4   5   6
    #  ts : 0  1  2  25   3  26   5
    # at arr=4 (ts=3): wm=25 > window_end(0..10)=10+2  -> dropped
    # at arr=6 (ts=5): wm=26 > 12                      -> dropped
    # at arr=5 (ts=26): wm=25 < 30+2                   -> accepted
    t = [0, 1, 2, 25, 3, 26, 5]
    df = pd.DataFrame({
        "arr": np.arange(7, dtype=np.int64),
        "ts": pd.to_datetime(np.asarray(t, dtype=np.int64)
                             * 1_000_000_000),
        "v": np.asarray(t, dtype=np.float64),
        "k": ["a"] * 7,
    })
    for n_buckets in (1, 3):
        out = watermarked_window_split(
            ray.data.from_pandas(df).repartition(3), "ts", "arr", "v",
            window_s=10, lateness_s=2, key_col="k",
            n_buckets=n_buckets).to_pandas()
        acc = out[out.acc_i == 1].sort_values("v")
        assert acc["v"].tolist() == [0.0, 1.0, 2.0, 25.0, 26.0]
        assert acc["wkey"].tolist() == ["0|a", "0|a", "0|a", "20|a",
                                        "20|a"]
        drp = out[out.drop_i == 1].sort_values("v")
        assert drp["v"].tolist() == [3.0, 5.0]
        assert drp["wkey"].tolist() == ["0|a", "0|a"]


def test_events_windowed_heavy_exact(ray_session):
    """Per-window Misra-Gries top-3 equals the exact SQL window counts
    (distinct keys <= capacity => exact, max_undercount == 0)."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    sort = ["w", "est_count", "event_type"]
    got = e.queries()["events_windowed_heavy"](sf).to_pandas() \
        .sort_values(sort, ascending=[True, False, True]) \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(e.oracle_sql()["events_windowed_heavy"]).df() \
        .sort_values(sort, ascending=[True, False, True]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert (got["max_undercount"] == 0).all()


def test_events_watermarked_trending_exact(ray_session):
    """Watermark-gated per-window top-3 equals exact SQL counts over the
    accepted stream (late-dropped events excluded on both sides)."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    srt = ["window_start", "est_count", "event_type"]
    got = e.queries()["events_watermarked_trending"](sf).to_pandas() \
        .sort_values(srt, ascending=[True, False, True]) \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(e.oracle_sql()["events_watermarked_trending"]).df() \
        .sort_values(srt, ascending=[True, False, True]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert (got["max_undercount"] == 0).all()


def test_windowed_join_count_bruteforce(ray_session):
    """Stream-stream interval join matches the all-pairs brute force,
    including exact 0 and window_s boundaries and bucket edges."""
    import ray.data as rd

    from t_digest_ray.pipelines.windows import windowed_join_count

    rng = np.random.default_rng(13)
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    w_s = 60
    n_l, n_r = 400, 350
    tl = base + rng.integers(0, 3600 * 4, n_l) * 1_000_000
    tr = base + rng.integers(0, 3600 * 4, n_r) * 1_000_000
    # force boundary hits: dt == 0 and dt == exactly w_s
    tl = np.concatenate([tl, [base, base + 120_000_000]])
    tr = np.concatenate([tr, [base, base + 120_000_000 + w_s * 1_000_000]])
    kl = rng.integers(0, 8, len(tl)).astype(np.int64)
    kr = rng.integers(0, 8, len(tr)).astype(np.int64)
    kl[-2:] = 7
    kr[-2:] = 7

    left = pd.DataFrame({"u": kl, "ts": pd.to_datetime(tl, unit="us")})
    right = pd.DataFrame({"u": kr, "ts": pd.to_datetime(tr, unit="us")})

    dt = tr[None, :] - tl[:, None]
    match = (kl[:, None] == kr[None, :]) & (dt >= 0) \
        & (dt <= w_s * 1_000_000)
    want = (pd.DataFrame({"u": kl, "n": match.sum(axis=1)})
            .groupby("u")["n"].sum())
    want = want[want > 0].astype(np.int64)

    out = windowed_join_count(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(3),
        "u", "ts", window_s=w_s).to_pandas()
    got = out.set_index("u")["n_pairs"].sort_index()
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_retention_cohorts_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from t_digest_ray.pipelines.windows import retention_cohorts

    base = pd.Timestamp("2026-01-01")
    rows = []
    # u1 active days 0,1,7; u2 active days 0,2; u3 active day 1,2
    for u, days in ((1, [0, 1, 7]), (2, [0, 2]), (3, [1, 2])):
        for d in days:
            rows.append({"user_id": u, "ts": base + pd.Timedelta(days=d,
                                                                 hours=3)})
            rows.append({"user_id": u, "ts": base + pd.Timedelta(days=d,
                                                                 hours=9)})
    df = pd.DataFrame(rows)
    out = (retention_cohorts(rd.from_pandas(df).repartition(3),
                             "user_id", "ts", deltas=(1, 7))
           .to_pandas().set_index(["day", "delta"]).sort_index())
    d0 = int((base - pd.Timestamp("1970-01-01")).days)
    # day 0: active {u1,u2}; day+1 active {u1,u3} -> retained u1
    assert out.loc[(d0, 1), "n_active"] == 2
    assert out.loc[(d0, 1), "n_retained"] == 1
    # day 0 delta 7: u1 active on day 7 -> retained 1 of 2
    assert out.loc[(d0, 7), "n_retained"] == 1
    # day 1: active {u1,u3}; day 2 active {u2,u3} -> retained u3
    assert out.loc[(d0 + 1, 1), "n_active"] == 2
    assert out.loc[(d0 + 1, 1), "n_retained"] == 1


def test_funnel_counts_strict_order(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from t_digest_ray.pipelines.windows import funnel_counts

    t0 = pd.Timestamp("2026-01-01")

    def ev(u, minutes, typ):
        return {"user_id": u, "ts": t0 + pd.Timedelta(minutes=minutes),
                "event_type": typ}

    rows = [
        # u1 completes all three in order
        ev(1, 0, "click"), ev(1, 5, "view"), ev(1, 9, "purchase"),
        # u2: view BEFORE click -> only step 1
        ev(2, 3, "view"), ev(2, 4, "click"),
        # u3: click then view, purchase before view -> steps 1-2
        ev(3, 0, "purchase"), ev(3, 1, "click"), ev(3, 2, "view"),
        # u4: no click at all -> zero steps
        ev(4, 0, "view"), ev(4, 1, "purchase"),
    ]
    out = funnel_counts(rd.from_pandas(pd.DataFrame(rows)).repartition(3),
                        "user_id", "ts", "event_type",
                        ["click", "view", "purchase"])
    assert out.iloc[0]["n_step1"] == 3   # u1, u2, u3 clicked
    assert out.iloc[0]["n_step2"] == 2   # u1, u3 viewed after click
    assert out.iloc[0]["n_step3"] == 1   # only u1 purchased after view


def test_transition_counts_matches_pandas_lag(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from t_digest_ray.pipelines.windows import transition_counts

    rng = np.random.default_rng(17)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 12, n),
        "ts": pd.Timestamp("2026-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
        "event_id": np.arange(n),
        "event_type": rng.choice(["a", "b", "c"], n)})
    got = (transition_counts(rd.from_pandas(df).repartition(4),
                             "user_id", "ts", "event_id", "event_type")
           .to_pandas().set_index(["prev_type", "next_type"])
           .sort_index())

    d = df.sort_values(["user_id", "ts", "event_id"])
    prev = d.groupby("user_id")["event_type"].shift()
    want = (pd.DataFrame({"prev_type": prev, "next_type": d["event_type"]})
            .dropna().groupby(["prev_type", "next_type"]).size())
    assert len(got) == len(want)
    for k, v in want.items():
        assert got.loc[k, "n"] == v


def test_dgim_layout_matches_online_simulation():
    """The closed-form bijective-base-2 layout IS the end state of the
    online DGIM maintenance (add size-1 bucket; three of a size merge
    the two oldest into the next power), for every n up to 2000."""
    def online(n):
        d = []
        for _ in range(n):
            j, add = 0, 1
            while True:
                if j >= len(d):
                    d.append(0)
                d[j] += add
                if d[j] <= 2:
                    break
                d[j] -= 2
                add = 1
                j += 1
        return d

    def closed(n):
        d = []
        while n > 0:
            dig = ((n - 1) % 2) + 1
            d.append(dig)
            n = (n - dig) // 2
        return d

    for n in range(1, 2001):
        assert online(n) == closed(n), n


def test_dgim_window_report_bound_and_invariance(ray_session, rng):
    import ray
    from t_digest_ray.pipelines.windows import dgim_window_report

    n = 5000
    base = 1_700_000_000_000_000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "ts": pd.to_datetime(
            base + np.sort(rng.integers(0, 30 * 86_400_000_000, n)),
            unit="us"),
    })
    ds = ray.data.from_pandas(df)
    out = dgim_window_report(ds.repartition(9), "k", "ts",
                             window_s=7 * 86400).to_pandas()
    out2 = dgim_window_report(ds.repartition(1), "k", "ts",
                              window_s=7 * 86400).to_pandas()
    a = out.sort_values("k").reset_index(drop=True)
    b = out2.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # layout-invariant
    assert a["within_bound"].all()       # published 50% bound holds
    for _, r in a.iterrows():
        assert r["n_total"] >= r["n_window_exact"] > 0
        err = abs(r["dgim_estimate"] - r["n_window_exact"])
        assert err <= 0.5 * r["n_window_exact"] + 1e-9


def test_interval_overlap_join_bruteforce(ray_session):
    """Interval overlap join matches the all-pairs brute force, with
    durations spanning multiple buckets, zero-length intervals, and
    starts planted exactly on bucket edges."""
    import ray.data as rd

    from t_digest_ray.pipelines.windows import interval_overlap_join

    rng = np.random.default_rng(29)
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    bucket_s = 100
    n_l, n_r = 300, 280
    sl = base + rng.integers(0, 3600, n_l) * 1_000_000
    sr = base + rng.integers(0, 3600, n_r) * 1_000_000
    dl = rng.integers(0, 350, n_l) * 1_000_000         # 0..3.5 buckets
    dr = rng.integers(0, 350, n_r) * 1_000_000
    # plant starts exactly on bucket edges and equal-start ties
    sl = np.concatenate([sl, [base, base + 200_000_000]])
    sr = np.concatenate([sr, [base, base + 200_000_000]])
    dl = np.concatenate([dl, [100_000_000, 50_000_000]])
    dr = np.concatenate([dr, [100_000_000, 50_000_000]])
    kl = rng.integers(0, 6, len(sl)).astype(np.int64)
    kr = rng.integers(0, 6, len(sr)).astype(np.int64)
    kl[-2:] = 5
    kr[-2:] = 5

    left = pd.DataFrame({"u": kl, "ts": pd.to_datetime(sl, unit="us"),
                         "dur_us": dl})
    right = pd.DataFrame({"u": kr, "ts": pd.to_datetime(sr, unit="us"),
                          "dur_us": dr})

    el, er = sl + dl, sr + dr
    match = ((kl[:, None] == kr[None, :])
             & (sl[:, None] < er[None, :])
             & (sr[None, :] < el[:, None]))
    want = (pd.DataFrame({"u": kl, "n": match.sum(axis=1)})
            .groupby("u")["n"].sum())
    want = want[want > 0].astype(np.int64)

    out = interval_overlap_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(3),
        "u", "ts", "dur_us", bucket_s=bucket_s).to_pandas()
    got = out.set_index("u")["n_pairs"].sort_index()
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_sequence_pattern_counts(ray_session):
    """Pattern flags match a per-key local replay, including the
    max_events truncation and unknown-type drop."""
    import re

    import ray.data as rd

    from t_digest_ray.pipelines.windows import sequence_pattern_counts

    rng = np.random.default_rng(19)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 9, n).astype(np.int64),
        "o": rng.permutation(n).astype(np.int64),
        "t": np.arange(n, dtype=np.int64),
        "ty": rng.choice(["a", "b", "x"], n)})   # 'x' unmapped
    cm = {"a": "a", "b": "b"}
    pats = {"ab_run": "ab+a", "any_b": "b"}

    def replay():
        out = {}
        for kk, g in df.sort_values(["o", "t"]).groupby("k"):
            seq = "".join(cm.get(v, "") for v in g.head(12)["ty"])
            out[kk] = {nm: bool(re.search(rx, seq))
                       for nm, rx in pats.items()}
        return out

    want = replay()
    got = sequence_pattern_counts(
        rd.from_pandas(df).repartition(5), "k", "o", "t", "ty",
        cm, pats, max_events=12)
    got = got.set_index("pattern")
    for nm in pats:
        assert got.loc[nm, "n_keys_matched"] == sum(
            v[nm] for v in want.values())
        assert got.loc[nm, "n_keys"] == len(want)


def test_ohlc_bars_planted(ray_session):
    from t_digest_ray.pipelines.windows import ohlc_bars
    import ray
    # window 60s; (event_id, ts_s, kind, value); ids 3/4 share ts=30 so
    # the tie column decides open-vs-close order deterministically
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "ts": pa.array([10 * US, 50 * US, 30 * US, 30 * US, 70 * US],
                       type=pa.int64()).cast(pa.timestamp("us")),
        "kind": pa.array(["a", "a", "a", "a", "a"]),
        "v": pa.array([5.0, 9.0, 1.0, 7.0, 2.0]),
    })
    expected = {
        (0, "open_v"): 5.0, (0, "high_v"): 9.0, (0, "low_v"): 1.0,
        (0, "close_v"): 9.0, (0, "n_events"): 4,
        (60, "open_v"): 2.0, (60, "close_v"): 2.0, (60, "n_events"): 1,
    }
    # layout invariance: 1 block vs 5 single-row blocks (merge order)
    for nblocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        out = (ohlc_bars(ds, "ts", "event_id", "v", 60, key="kind")
               .to_pandas().set_index("window_start_s"))
        assert len(out) == 2
        for (w, col), want in expected.items():
            assert out.loc[w, col] == want, (nblocks, w, col)


def test_ohlc_bars_tie_uses_tie_column(ray_session):
    from t_digest_ray.pipelines.windows import ohlc_bars
    import ray
    # both rows at the SAME ts: open is the lower event_id's value,
    # close the higher — regardless of row order in the block
    t = pa.table({
        "event_id": pa.array([9, 2], type=pa.int64()),
        "ts": pa.array([5 * US, 5 * US],
                       type=pa.int64()).cast(pa.timestamp("us")),
        "kind": pa.array(["x", "x"]),
        "v": pa.array([111.0, 222.0]),
    })
    out = (ohlc_bars(ray.data.from_arrow(t), "ts", "event_id", "v", 60,
                     key="kind").to_pandas())
    assert out["open_v"].iloc[0] == 222.0   # event_id 2 first
    assert out["close_v"].iloc[0] == 111.0  # event_id 9 last


def test_moving_frame_extrema_hand(ray_session):
    import ray.data as rd

    from t_digest_ray.pipelines.windows import moving_frame_extrema

    df = pd.DataFrame({
        "k": ["a"] * 5,
        "ts": pd.to_datetime([1, 2, 3, 4, 5], unit="s"),
        "eid": [1, 2, 3, 4, 5],
        "value": [3.0, 1.0, 4.0, 1.0, 5.0]})
    out = (moving_frame_extrema(rd.from_pandas(df), "k", "ts", "eid",
                                "value", frame=3)
           .to_pandas().sort_values("eid"))
    assert out["frame_max_cents"].tolist() == [300, 300, 400, 400, 500]
    assert out["frame_min_cents"].tolist() == [300, 100, 100, 100, 100]
    assert out["frame_range_cents"].tolist() == [0, 200, 300, 300, 400]


def test_moving_frame_extrema_matches_pandas(ray_session, rng):
    import ray.data as rd

    from t_digest_ray.pipelines.windows import moving_frame_extrema

    n = 400
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], size=n),
        "ts": pd.to_datetime(rng.integers(0, 1000, size=n), unit="s"),
        "eid": np.arange(n),
        "value": rng.integers(0, 10000, size=n) / 100.0})
    out = (moving_frame_extrema(rd.from_pandas(df), "k", "ts", "eid",
                                "value", frame=7)
           .to_pandas().sort_values("eid").reset_index(drop=True))
    exp = df.assign(cents=np.floor(df["value"] * 100 + 0.5).astype(int))
    exp = exp.sort_values(["k", "ts", "eid"])
    emax = (exp.groupby("k")["cents"]
            .rolling(7, min_periods=1).max().reset_index(0, drop=True))
    exp = exp.assign(emax=emax).sort_values("eid")
    assert out["frame_max_cents"].tolist() == [int(x) for x in exp["emax"]]


def test_association_rules_hand(ray_session):
    import ray.data as rd

    from t_digest_ray.pipelines.windows import association_rules

    # baskets: u1/day0 {A,B}, u2/day0 {A,B}, u3/day0 {A}, u4/day0 {B,C}
    df = pd.DataFrame({
        "u": [1, 1, 2, 2, 3, 4, 4],
        "ts": pd.to_datetime([10] * 7, unit="s"),
        "t": ["A", "B", "A", "B", "A", "B", "C"]})
    out = association_rules(rd.from_pandas(df), "u", "ts", "t") \
        .set_index(["antecedent", "consequent"])
    # support A=3, B=3, C=1, AB=2, BC=1, N=4
    assert int(out.loc[("A", "B"), "n_both"]) == 2
    assert int(out.loc[("A", "B"), "conf_ppm"]) == 2 * 10**6 // 3
    assert int(out.loc[("A", "B"), "lift_ppm"]) == 2 * 4 * 10**6 // 9
    assert int(out.loc[("C", "B"), "conf_ppm"]) == 10**6
    assert int(out.loc[("B", "C"), "conf_ppm"]) == 10**6 // 3
    assert ("A", "C") not in out.index  # never co-occur


def test_association_rules_dedups_within_basket(ray_session):
    import ray.data as rd

    from t_digest_ray.pipelines.windows import association_rules

    # repeated events of the same type in one basket count once
    df = pd.DataFrame({
        "u": [1, 1, 1, 1],
        "ts": pd.to_datetime([5, 6, 7, 8], unit="s"),
        "t": ["A", "A", "B", "B"]})
    out = association_rules(rd.from_pandas(df), "u", "ts", "t")
    assert int(out["n_both"].iloc[0]) == 1
    assert (out["conf_ppm"] == 10**6).all()


def test_growth_accounting_hand(ray_session):
    import ray.data as rd

    from t_digest_ray.pipelines.windows import first_last_day_counts

    # u1 active d0-d2, u2 only d1, u3 only d2
    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 3],
        "ts": pd.to_datetime([0, 86400, 2 * 86400, 86400, 2 * 86400],
                             unit="s")})
    out = first_last_day_counts(rd.from_pandas(df), "u", "ts") \
        .set_index("day")
    assert int(out.loc[0, "n_new"]) == 1       # u1
    assert int(out.loc[1, "n_new"]) == 1       # u2
    assert int(out.loc[2, "n_new"]) == 1       # u3
    assert int(out.loc[1, "n_last_seen"]) == 1  # u2
    assert int(out.loc[2, "n_last_seen"]) == 2  # u1, u3
    assert int(out.loc[0, "n_last_seen"]) == 0


def test_kaplan_meier_hand_cascade(ray_session):
    import ray.data as rd

    from t_digest_ray.pipelines.windows import kaplan_meier_lifetimes

    # end day = 9. users: u1 lifetime 0 (event), u2 lifetime 2 (event),
    # u3 lifetime 2 (event), u4 lifetime 9 last day -> censored,
    # u5 lifetime 0 but last day 9 -> censored.
    df = pd.DataFrame({
        "u": [1, 2, 2, 3, 3, 4, 4, 5],
        "ts": pd.to_datetime(
            np.array([0, 1, 3, 2, 4, 0, 9, 9]) * 86400, unit="s")})
    out = kaplan_meier_lifetimes(rd.from_pandas(df), "u", "ts")
    # events at t=0 (u1, n=5): S = 1e9*4//5 = 8e8. u5 (censored at
    # t=0) leaves the risk set after t=0 (deaths-first convention), so
    # at t=2 the risk set is {u2,u3,u4} = 3: S = 8e8*1//3.
    assert out["t_days"].tolist() == [0, 2]
    assert out["n_at_risk"].tolist() == [5, 3]
    assert out["d_events"].tolist() == [1, 2]
    assert out["surv_scaled"].tolist() == [800000000,
                                           800000000 * 1 // 3]


def test_kaplan_meier_all_censored(ray_session):
    import ray.data as rd

    from t_digest_ray.pipelines.windows import kaplan_meier_lifetimes

    # everyone's last day is the end day: nothing but censoring.
    df = pd.DataFrame({
        "u": [1, 1, 2, 2],
        "ts": pd.to_datetime(np.array([0, 5, 3, 5]) * 86400,
                             unit="s")})
    out = kaplan_meier_lifetimes(rd.from_pandas(df), "u", "ts")
    assert len(out) == 0


def test_ses_forecast_hand_cascade(ray_session):
    import ray.data as rd

    from t_digest_ray.pipelines.windows import ses_daily_forecast

    # daily totals: d0=400, d1=0 (gap), d2=800 cents
    df = pd.DataFrame({
        "ts": pd.to_datetime([0, 10, 2 * 86400], unit="s"),
        "value": [3.0, 1.0, 8.0]})
    out = ses_daily_forecast(rd.from_pandas(df), "ts", "value")
    assert out["actual_cents"].tolist() == [400, 0, 800]
    # s0=400; s1=(0+3*400)//4=300; s2=(800+3*300)//4=425
    assert out["smoothed_cents"].tolist() == [400, 300, 425]
    assert out["forecast_cents"].tolist() == [400, 400, 300]
    assert out["abs_err_cents"].tolist() == [0, 400, 500]


def test_ses_constant_series_is_fixed_point(ray_session):
    import ray.data as rd

    from t_digest_ray.pipelines.windows import ses_daily_forecast

    df = pd.DataFrame({
        "ts": pd.to_datetime(np.arange(5) * 86400, unit="s"),
        "value": [7.0] * 5})
    out = ses_daily_forecast(rd.from_pandas(df), "ts", "value")
    assert (out["smoothed_cents"] == 700).all()
    assert (out["abs_err_cents"] == 0).all()


def test_peak_concurrency_hand(ray_session):
    import ray.data as rd

    from t_digest_ray.pipelines.windows import peak_concurrency

    # three users, sessions: u1 [0,10], u2 [5,20], u3 [15,30] seconds
    # -> concurrency peaks at 2 ([5,10] and [15,20]).
    df = pd.DataFrame({
        "u": [1, 1, 2, 2, 3, 3],
        "ts": pd.to_datetime([0, 10, 5, 20, 15, 30], unit="s")})
    out = peak_concurrency(rd.from_pandas(df), "u", "ts", gap_s=1800)
    assert int(out["n_sessions"].iloc[0]) == 3
    assert int(out["peak_concurrency"].iloc[0]) == 2


def test_peak_concurrency_instant_handoff_counts_both(ray_session):
    import ray.data as rd

    from t_digest_ray.pipelines.windows import peak_concurrency

    # u1 ends exactly when u2 starts: closed intervals -> concurrent.
    df = pd.DataFrame({
        "u": [1, 1, 2, 2],
        "ts": pd.to_datetime([0, 100, 100, 200], unit="s")})
    out = peak_concurrency(rd.from_pandas(df), "u", "ts", gap_s=1800)
    assert int(out["peak_concurrency"].iloc[0]) == 2


def test_peak_concurrency_gap_splits_sessions(ray_session):
    import ray.data as rd

    from t_digest_ray.pipelines.windows import peak_concurrency

    # one user with a > gap pause: two sessions, never concurrent
    # with themselves.
    df = pd.DataFrame({
        "u": [1, 1, 1, 1],
        "ts": pd.to_datetime([0, 100, 5000, 5100], unit="s")})
    out = peak_concurrency(rd.from_pandas(df), "u", "ts", gap_s=1800)
    assert int(out["n_sessions"].iloc[0]) == 2
    assert int(out["peak_concurrency"].iloc[0]) == 1
