"""Non-parquet sources: JSONL parse-time projection, CSV column pruning,
deterministic cached export (atomic shards)."""

from __future__ import annotations

import glob
import os

import pandas as pd
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


def test_warc_roundtrip_matches_parquet(ray_session):
    """WARC-style export -> incremental datasource read reproduces the
    parquet table exactly, payload included (VERDICT r02 item 4)."""
    import pyarrow.parquet as pq

    from t_digest_ray.sources.warc import documents_warc

    want = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars", "text"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = documents_warc(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == ["doc_id", "lang", "n_chars", "text"]
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["n_chars"].tolist() == want["n_chars"].tolist()
    # payload byte-identical per doc (the north-star per-row invariant)
    assert (got["text"].fillna("") == want["text"].fillna("")).all()


def test_warc_parser_chunk_boundaries_and_errors(tmp_path):
    """The buffered parser carries partial records across chunk boundaries
    and rejects malformed/truncated input clearly."""
    import pytest as _pytest

    from t_digest_ray.sources.warc import (_parse_records, write_warcish)

    payloads = [b"hello world", b"", b"x" * 1000, "café".encode()]
    headers = [{"X-id": i} for i in range(len(payloads))]
    dest = str(tmp_path / "t.warc")
    write_warcish(dest, payloads, headers)
    blob = open(dest, "rb").read()

    # whole-buffer parse
    recs, left = _parse_records(blob, eof=True)
    assert left == b"" and [p for _, p in recs] == payloads
    assert [h["X-id"] for h, _ in recs] == ["0", "1", "2", "3"]

    # parse under every possible split point: same records
    for cut in range(0, len(blob), 97):
        r1, carry = _parse_records(blob[:cut], eof=False)
        r2, left = _parse_records(carry + blob[cut:], eof=True)
        assert left == b""
        assert [p for _, p in r1 + r2] == payloads, cut

    with _pytest.raises(ValueError, match="WARC"):
        _parse_records(b"GARBAGE/1.0\r\nContent-Length: 0\r\n\r\n", True)
    with _pytest.raises(ValueError, match="truncated"):
        _parse_records(blob[:len(blob) - 20], eof=True)


def test_warc_multi_chunk_stream(ray_session, tmp_path):
    """A shard larger than the read buffer streams correctly (records
    spanning chunk reads)."""
    from t_digest_ray.sources.warc import read_warcish, write_warcish

    payloads = [("doc %d " % i + "z" * 500).encode() for i in range(200)]
    headers = [{"X-doc_id": i} for i in range(200)]
    dest = str(tmp_path / "big.warc")
    write_warcish(dest, payloads, headers)
    import pyarrow as pa
    got = read_warcish(dest, [("doc_id", pa.int64())], "text",
                       chunk_size=1024).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 200
    assert got["text"].tolist() == [p.decode() for p in payloads]


def test_ipc_source_roundtrip(ray_session, sf_smoke):
    """IPC stream shards reproduce the parquet table exactly."""
    import pyarrow.parquet as pq

    from t_digest_ray.sources.arrow_ipc import documents_ipc

    ds = documents_ipc(sf_smoke, ["doc_id", "lang", "n_chars"])
    got = (ds.to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = (pq.read_table(f"{sf_smoke}/documents.parquet",
                          columns=["doc_id", "lang", "n_chars"])
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_read_harmonized_parquet(ray_session, tmp_path):
    """Harmonized multi-schema read: missing columns become typed
    nulls, extras are dropped, and the union matches a direct build."""
    import numpy as np
    import ray.data as rd

    from t_digest_ray.sources.text_files import read_harmonized_parquet

    v1 = pd.DataFrame({"id": np.array([1, 2], dtype=np.int64),
                       "n": np.array([10, 20], dtype=np.int64),
                       "extra": ["x", "y"]})      # dropped
    v2 = pd.DataFrame({"id": np.array([3], dtype=np.int64),
                       "n": np.array([30], dtype=np.int64),
                       "lang": ["en"]})
    d1, d2 = tmp_path / "v1", tmp_path / "v2"
    d1.mkdir(); d2.mkdir()
    rd.from_pandas(v1).write_parquet(str(d1))
    rd.from_pandas(v2).write_parquet(str(d2))

    target = pa.schema([("id", pa.int64()), ("n", pa.int64()),
                        ("lang", pa.string())])
    out = (read_harmonized_parquet([str(d1), str(d2)], target)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert list(out.columns) == ["id", "n", "lang"]
    assert out["lang"].tolist()[:2] == [None, None]
    assert out["lang"].tolist()[2] == "en"
    assert out["n"].tolist() == [10, 20, 30]
