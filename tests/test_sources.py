"""Non-parquet sources: JSONL parse-time projection, CSV column pruning,
deterministic cached export (atomic shards)."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pytest

from t_digest_ray.sources.text_files import (_export, documents_jsonl,
                                             events_csv, read_csv,
                                             read_jsonl)

SF = "/root/testdata/sf0.001"


def test_jsonl_projection_ignores_unknown_fields(ray_session, tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text(
        '{"a": 1, "b": "x", "junk": [1,2,3], "huge": "zzz"}\n'
        '{"a": 2, "b": "y", "junk": null, "huge": "qqq"}\n')
    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    df = read_jsonl(str(p), schema).to_pandas()
    assert sorted(df.columns) == ["a", "b"]
    assert sorted(df["a"]) == [1, 2]


def test_csv_include_columns(ray_session, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("a,b,c\n1,x,9\n2,y,8\n")
    df = read_csv(str(p), ["a", "c"]).to_pandas()
    assert sorted(df.columns) == ["a", "c"]
    assert sorted(df["c"]) == [8, 9]


def test_export_cached_and_atomic(ray_session):
    out1 = _export(SF, "documents", ["doc_id", "lang"], "jsonl")
    shards = sorted(glob.glob(os.path.join(out1, "*.jsonl")))
    assert len(shards) == 4
    mtimes = [os.path.getmtime(s) for s in shards]
    out2 = _export(SF, "documents", ["doc_id", "lang"], "jsonl")
    assert out2 == out1
    assert [os.path.getmtime(s) for s in shards] == mtimes  # cache hit
    assert not glob.glob(os.path.join(out1, "*.tmp-*"))


def test_jsonl_csv_match_parquet(ray_session):
    import pyarrow.parquet as pq

    want = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = documents_jsonl(SF, ["doc_id", "n_chars"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got[["doc_id", "n_chars"]].equals(want)

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id"]).to_pandas()
    got_ev = events_csv(SF, ["event_id"]).to_pandas()
    assert sorted(got_ev["event_id"]) == sorted(ev["event_id"])
