"""Range-partitioned sort-merge join (stages/sortmerge.py): pandas-merge
parity with duplicate keys on both sides, ordered-output property,
skewed-key balance via equi-depth boundaries."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _join(l, r, **kw):
    import ray.data as rd

    from t_digest_ray.stages.sortmerge import sort_merge_join

    return sort_merge_join(rd.from_pandas(l), rd.from_pandas(r),
                           "k", ["a"], ["b"], **kw).to_pandas()


def test_matches_pandas_merge_with_duplicates(ray_session, rng):
    l = pd.DataFrame({"k": rng.integers(0, 40, 500).astype(np.int64),
                      "a": np.arange(500, dtype=np.int64)})
    r = pd.DataFrame({"k": rng.integers(0, 40, 300).astype(np.int64),
                      "b": np.arange(300, dtype=np.int64) * 2})
    out = _join(l, r)
    exp = l.merge(r, on="k")
    cols = ["k", "a", "b"]
    pd.testing.assert_frame_equal(
        out[cols].sort_values(cols).reset_index(drop=True)
        .astype("int64"),
        exp[cols].sort_values(cols).reset_index(drop=True)
        .astype("int64"))


def test_output_blocks_are_key_sorted(ray_session, rng):
    import ray.data as rd

    from t_digest_ray.stages.sortmerge import sort_merge_join

    l = pd.DataFrame({"k": rng.integers(0, 1000, 2000).astype(np.int64),
                      "a": np.arange(2000, dtype=np.int64)})
    r = pd.DataFrame({"k": np.arange(1000, dtype=np.int64),
                      "b": np.arange(1000, dtype=np.int64)})
    ds = sort_merge_join(rd.from_pandas(l), rd.from_pandas(r),
                         "k", ["a"], ["b"], n_ranges=4)
    for batch in ds.iter_batches(batch_format="pandas",
                                 batch_size=None):
        ks = batch["k"].to_numpy()
        assert (np.diff(ks) >= 0).all()  # sorted within each block


def test_skewed_key_still_joins(ray_session):
    # 90% of the left side is one key: equi-depth boundaries put the
    # hot key in its own range; result must still be exact.
    l = pd.DataFrame({"k": np.concatenate(
        [np.full(900, 7), np.arange(100)]).astype(np.int64),
        "a": np.arange(1000, dtype=np.int64)})
    r = pd.DataFrame({"k": np.array([7, 8, 9], dtype=np.int64),
                      "b": np.array([70, 80, 90], dtype=np.int64)})
    out = _join(l, r)
    exp = l.merge(r, on="k")
    assert len(out) == len(exp) == 903
    assert (out[out["k"] == 7]["b"] == 70).all()


def test_disjoint_keys_empty(ray_session):
    l = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                      "a": np.arange(10, dtype=np.int64)})
    r = pd.DataFrame({"k": np.arange(100, 110, dtype=np.int64),
                      "b": np.arange(10, dtype=np.int64)})
    assert len(_join(l, r)) == 0
