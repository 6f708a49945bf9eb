"""Sorted-neighborhood blocking (stages/linkage.py): exact pair-set
parity with a brute-force windowed scan over the global order,
including pairs that cross prefix-bucket boundaries and runs spanning
near-empty buckets."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _brute(df, sort_col, id_col, w):
    s = df.sort_values([sort_col, id_col]).reset_index(drop=True)
    out = set()
    for i in range(len(s)):
        for j in range(i + 1, min(i + w, len(s) - 1) + 1):
            out.add((s[id_col][i], s[id_col][j], j - i))
    return out


def _run(df, w, pfx):
    import ray.data as rd

    from t_digest_ray.stages.linkage import sorted_neighborhood_pairs

    got = sorted_neighborhood_pairs(
        rd.from_pandas(df), "key", "rid", ["val"], window=w,
        prefix_len=pfx).to_pandas()
    return got, set(zip(got["id_a"], got["id_b"], got["gap"]))


def test_snm_matches_brute_force_many_buckets(ray_session, rng):
    keys = ["".join(rng.choice(list("abcd"), 3)) for _ in range(300)]
    df = pd.DataFrame({"rid": [f"r{i:03d}" for i in range(300)],
                       "key": keys,
                       "val": rng.integers(0, 5, 300)})
    got, got_set = _run(df, w=4, pfx=2)
    assert got_set == _brute(df, "key", "rid", 4)
    vals = dict(zip(df["rid"], df["val"]))
    assert all(vals[a] == va and vals[b] == vb
               for a, b, va, vb in zip(got["id_a"], got["id_b"],
                                       got["val_a"], got["val_b"]))


def test_snm_window_spans_tiny_buckets(ray_session):
    # single-record buckets force every in-window pair through the
    # boundary fold, including spans across 3+ buckets.
    df = pd.DataFrame({"rid": [f"r{i}" for i in range(6)],
                       "key": list("abcdef"),
                       "val": np.arange(6)})
    _, got_set = _run(df, w=3, pfx=1)
    assert got_set == _brute(df, "key", "rid", 3)
    assert ("r0", "r3", 3) in got_set


def test_snm_single_bucket_equals_plain_window(ray_session):
    df = pd.DataFrame({"rid": [f"r{i}" for i in range(10)],
                       "key": [f"zz{i}" for i in range(10)],
                       "val": np.arange(10)})
    _, got_set = _run(df, w=2, pfx=2)
    assert got_set == _brute(df, "key", "rid", 2)
