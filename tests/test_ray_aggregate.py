"""Ray-level distributed equivalence tests (the layer-3 centerpiece,
SURVEY.md §5: groupby-aggregate vs driver-side loop, parallelism invariance,
byte-identical extraction per url at two parallelism levels)."""

import numpy as np
import pandas as pd
import pytest

from t_digest_ray.pipelines.quantiles import (pages_quantiles,
                                              quantiles_by_key,
                                              tdigest_spec)
from t_digest_ray.sources.pages import synthetic_pages
from t_digest_ray.stages.aggregate import sketch_aggregate_fn, sketch_by_key
from t_digest_ray.stages.extract import ExtractText
from t_digest_ray.state.exact import exact_quantile
from t_digest_ray.state.tdigest import TDigest

N = 20_000


@pytest.fixture(scope="module")
def lineitem(ray_session):
    import ray.data as rd
    return rd.read_parquet("/root/testdata/sf0.01/lineitem.parquet",
                           columns=["l_returnflag", "l_extendedprice"])


def test_grouped_digest_matches_driver_loop(ray_session, lineitem):
    """Ray two-level merge == driver-side single-digest within merge bounds
    (AccuracyTest.java:137-149 tolerances applied to the Ray topology)."""
    out = quantiles_by_key(lineitem, "l_extendedprice", "l_returnflag",
                           num_salts=4, batch_size=4096).to_pandas()
    pdf = lineitem.to_pandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        vals = np.sort(grp["l_extendedprice"].to_numpy())
        row = out[out.l_returnflag == flag].iloc[0]
        assert row["n"] == len(vals)
        for q in (0.25, 0.5, 0.75, 0.99):
            est = row[f"q{int(q * 100)}"]
            # rank error of the estimate (AccuracyTest.java:137-149 bound)
            rank_err = abs(np.searchsorted(vals, est) / len(vals) - q)
            assert rank_err < 0.015, f"{flag} q{q}: {est} rank err {rank_err}"
        assert row["min"] == vals[0] and row["max"] == vals[-1]


def test_salted_vs_unsalted_equivalent(ray_session, lineitem):
    a = quantiles_by_key(lineitem, "l_extendedprice", "l_returnflag",
                         num_salts=1, batch_size=8192).to_pandas()
    b = quantiles_by_key(lineitem, "l_extendedprice", "l_returnflag",
                         num_salts=8, batch_size=8192).to_pandas()
    a = a.sort_values("l_returnflag").reset_index(drop=True)
    b = b.sort_values("l_returnflag").reset_index(drop=True)
    assert (a["n"] == b["n"]).all()
    for q in ("q50", "q99"):
        assert np.allclose(a[q], b[q], rtol=0.01)


def test_global_aggregate_fn(ray_session):
    """The generic AggregateFn adapter on Dataset.aggregate."""
    import ray.data as rd
    rng = np.random.default_rng(0)
    vals = rng.uniform(0, 1, N)
    ds = rd.from_pandas(pd.DataFrame({"x": vals}))
    spec = tdigest_spec(100)
    agg = sketch_aggregate_fn(spec, "x", name="digest")
    res = ds.aggregate(agg)
    d = TDigest.from_bytes(res["digest"])
    assert d.size == N
    s = np.sort(vals)
    assert abs(d.quantile(0.5) - exact_quantile(0.5, s)[0]) < 0.015


def test_parallelism_invariance_of_extraction(ray_session):
    """Byte-identical extracted text per url at 2 vs 16 blocks (the per-row
    invariant from BASELINE.json input_hint)."""
    outs = {}
    for blocks in (2, 16):
        pages = synthetic_pages(2_000, parallelism=blocks)
        ext = pages.map_batches(ExtractText(), batch_format="pyarrow")
        df = ext.select_columns(["url", "text", "extracted_text"]).to_pandas()
        assert (df["text"] == df["extracted_text"]).all()
        outs[blocks] = df.sort_values("url").reset_index(drop=True)
    assert outs[2]["url"].tolist() == outs[16]["url"].tolist()
    assert outs[2]["extracted_text"].tolist() == outs[16]["extracted_text"].tolist()


def test_sketch_rows_deterministic_across_parallelism(ray_session):
    """Final merged sketch summaries identical at different block counts:
    partials are content-derived and merges canonical."""
    res = {}
    for blocks in (3, 12):
        pages = synthetic_pages(10_000, parallelism=blocks)
        out = pages_quantiles(pages, value_cols=("text_length",),
                              num_salts=4)["text_length"].to_pandas()
        res[blocks] = out.sort_values("lang").reset_index(drop=True)
    a, b = res[3], res[12]
    assert a["lang"].tolist() == b["lang"].tolist()
    assert (a["n"] == b["n"]).all()
    # batch boundaries differ so sketches differ slightly — but only within
    # the merge tolerance
    assert np.allclose(a["q50"], b["q50"], rtol=0.02)
    assert np.allclose(a["min"], b["min"]) and np.allclose(a["max"], b["max"])


def test_fused_synthetic_flagship_matches_staged(ray_session):
    """synthetic_pages_quantiles (generation fused into the chunk loop —
    the pages block never materializes, VERDICT r02 item 2) must compute
    the same answer as the staged synthetic_pages -> pages_quantiles
    path, exactly: both process identical 4k-row generation chunks, so
    the partials and the canonical merge are bit-equal."""
    from t_digest_ray.pipelines.quantiles import synthetic_pages_quantiles

    staged = pages_quantiles(synthetic_pages(10_000, parallelism=3),
                             value_cols=("text_length", "html_size"),
                             num_salts=4)["html_size"].to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    fused = synthetic_pages_quantiles(10_000,
                                      value_cols=("text_length",
                                                  "html_size"),
                                      num_salts=4,
                                      rows_per_block=4096)["html_size"] \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    assert staged["lang"].tolist() == fused["lang"].tolist()
    assert (staged["n"] == fused["n"]).all()
    assert np.allclose(staged["q50"], fused["q50"], rtol=0.02)
    assert np.allclose(staged["min"], fused["min"])
    assert np.allclose(staged["max"], fused["max"])


def test_weighted_sketch_by_key(ray_session):
    import ray.data as rd
    df = pd.DataFrame({
        "g": ["a"] * 100 + ["b"] * 100,
        "x": np.concatenate([np.arange(100.0), np.arange(100.0) * 2]),
        "w": np.concatenate([np.ones(100), np.full(100, 3.0)]),
    })
    ds = rd.from_pandas(df)
    spec = tdigest_spec(100)
    out = sketch_by_key(ds, spec, "x", "g", weight_col="w",
                        num_salts=1, batch_size=64).to_pandas()
    assert set(out["key"]) == {"a", "b"}
    d = TDigest.from_bytes(
        out[out.key == "b"]["sketch"].iloc[0])
    assert d.size == 300.0


def test_hash_bucketed_group_agg_matches_pandas(ray_session):
    """The vectorized many-group aggregate equals pandas groupby for
    count/sum/min/max, at any bucket count."""
    import ray

    from t_digest_ray.stages.aggregate import hash_bucketed_group_agg

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "a": rng.integers(0, 300, 20_000).astype(np.int64),
        "b": rng.integers(0, 50, 20_000).astype(np.int64),
        "v": rng.normal(size=20_000),
    })
    want = (df.groupby(["a", "b"])
            .agg(n=("v", "size"), s=("v", "sum"),
                 lo=("v", "min"), hi=("v", "max"))
            .reset_index().sort_values(["a", "b"]).reset_index(drop=True))
    for coarse in (1, 64):
        got = hash_bucketed_group_agg(
            ray.data.from_pandas(df).repartition(5), ["a", "b"],
            {"n": ("v", "count"), "s": ("v", "sum"),
             "lo": ("v", "min"), "hi": ("v", "max")},
            coarse=coarse).to_pandas()
        got = got[["a", "b", "n", "s", "lo", "hi"]] \
            .sort_values(["a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"n": np.int64}), want.astype({"n": np.int64}))
