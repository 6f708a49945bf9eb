"""Record-delimited binary (WARC-style) source — the Common-Crawl
container shape (VERDICT r02 item 4).

Record framing follows the public WARC/1.0 layout (ISO 28500): a version
line, CRLF-terminated ``Name: value`` headers including the mandatory
``Content-Length``, a blank line, ``Content-Length`` payload bytes, and a
blank-line record separator::

    WARC/1.0\r\n
    WARC-Record-ID: <urn:doc:42>\r\n
    X-Lang: en\r\n
    Content-Length: 1234\r\n
    \r\n
    <1234 payload bytes>\r\n
    \r\n

Reader: a Ray ``FileBasedDatasource`` — one read task per file (shard),
each task parsing its stream INCREMENTALLY (bounded buffer, never the
whole file in memory) and emitting Arrow record batches of
(headers..., payload) — so a directory of 1 GB WARC shards streams
through the pipeline like any parquet source, with backpressure. The
buffered parser carries partial records across chunk boundaries, so
records may span reads.

Writer: ``export_warcish`` converts a testdata parquet table into sharded
WARC files once per (sf_dir, columns) under /tmp (content-addressed cache
dir, atomic tmp+rename per shard — same discipline as
``text_files._export``). Metadata columns ride as ``X-<name>`` headers;
``text`` rides as the payload, so the reader's output is column-identical
to the parquet path and the SAME DuckDB oracle applies.
"""

from __future__ import annotations

import hashlib
import os
import uuid

import pyarrow as pa

_CACHE_ROOT = "/tmp/tdr_srccache"
_N_SHARDS = 4
_CHUNK = 4 << 20  # reader buffer target; records never span >1 carry


def _cache_dir(sf_dir: str, table: str, columns: list[str]) -> str:
    key = f"{os.path.normpath(sf_dir)}|{','.join(columns)}|warc"
    tag = hashlib.sha1(key.encode()).hexdigest()[:10]
    return os.path.join(_CACHE_ROOT, f"{table}-warc-{tag}")


def write_warcish(dest: str, payloads: list[bytes],
                  headers: list[dict]) -> None:
    """Write one WARC-style shard (atomic tmp+rename)."""
    tmp = f"{dest}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        for pay, hdr in zip(payloads, headers):
            lines = [b"WARC/1.0"]
            for k, v in hdr.items():
                lines.append(f"{k}: {v}".encode())
            lines.append(f"Content-Length: {len(pay)}".encode())
            f.write(b"\r\n".join(lines) + b"\r\n\r\n")
            f.write(pay)
            f.write(b"\r\n\r\n")
    os.rename(tmp, dest)


def export_warcish(sf_dir: str, table: str = "documents",
                   meta_columns: tuple[str, ...] = ("doc_id", "lang",
                                                    "n_chars"),
                   payload_column: str = "text") -> str:
    """Deterministically convert {sf_dir}/{table}.parquet into WARC-style
    shards; cached under /tmp, safe under concurrent/repeated calls."""
    import pyarrow.parquet as pq

    columns = list(meta_columns) + [payload_column]
    out_dir = _cache_dir(sf_dir, table, columns)
    shards = [os.path.join(out_dir, f"part-{i}.warc")
              for i in range(_N_SHARDS)]
    if all(os.path.exists(s) for s in shards):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)
    n = t.num_rows
    step = -(-n // _N_SHARDS)
    for i, dest in enumerate(shards):
        part = t.slice(i * step, step)
        texts = part.column(payload_column).to_pylist()
        payloads = [(x or "").encode("utf-8") for x in texts]
        metas = part.select(list(meta_columns)).to_pylist()
        headers = [{"WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:doc:{m[meta_columns[0]]}>",
                    **{f"X-{k}": m[k] for k in meta_columns}}
                   for m in metas]
        write_warcish(dest, payloads, headers)
    return out_dir


def _parse_records(buf: bytes, eof: bool):
    """Parse complete records from ``buf``; returns (records, leftover).

    A record is (headers dict, payload bytes). Incomplete trailing data is
    returned as leftover for the next chunk (or raises at EOF)."""
    records = []
    pos = 0
    n = len(buf)
    while True:
        # skip inter-record blank lines
        while buf.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            return records, b""
        head_end = buf.find(b"\r\n\r\n", pos)
        if head_end < 0:
            if eof and buf[pos:].strip():
                raise ValueError("truncated WARC header at EOF")
            return records, buf[pos:]
        head = buf[pos:head_end]
        if not head.startswith(b"WARC/"):
            raise ValueError(
                f"bad record start {head[:20]!r} (not a WARC version line)")
        headers = {}
        for line in head.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode()] = v.strip().decode()
        clen = int(headers["Content-Length"])
        body_start = head_end + 4
        if body_start + clen > n:
            if eof:
                raise ValueError("truncated WARC payload at EOF")
            return records, buf[pos:]
        records.append((headers, buf[body_start:body_start + clen]))
        pos = body_start + clen

def _records_to_table(records, meta_fields: list[tuple[str, pa.DataType]],
                      payload_column: str) -> pa.Table:
    cols = {}
    for name, typ in meta_fields:
        vals = [h.get(f"X-{name}") for h, _ in records]
        if pa.types.is_integer(typ):
            arr = pa.array([int(v) if v is not None else None
                            for v in vals], type=typ)
        elif pa.types.is_floating(typ):
            arr = pa.array([float(v) if v is not None else None
                            for v in vals], type=typ)
        else:
            arr = pa.array(vals, type=pa.string())
        cols[name] = arr
    if payload_column:
        cols[payload_column] = pa.array(
            [p.decode("utf-8") for _, p in records], type=pa.string())
    return pa.table(cols)


def make_warc_datasource(paths, meta_fields: list[tuple[str, pa.DataType]],
                         payload_column: str | None = "text",
                         chunk_size: int = _CHUNK):
    """A Ray FileBasedDatasource over WARC-style shards.

    One read task per file; the stream is parsed incrementally with a
    bounded carry buffer (``chunk_size`` reads), yielding one Arrow table
    per buffer of records — a 1 GB shard never materializes at once."""
    from ray.data.datasource.file_based_datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["warc"]

        def _read_stream(self, f, path: str):
            buf = b""
            while True:
                chunk = f.read(chunk_size)
                eof = not chunk
                if chunk:
                    buf = buf + chunk if buf else chunk
                records, buf = _parse_records(buf, eof)
                if records:
                    yield _records_to_table(records, meta_fields,
                                            payload_column)
                if eof:
                    break

    return WarcDatasource(paths, file_extensions=["warc"])


def read_warcish(paths, meta_fields: list[tuple[str, pa.DataType]],
                 payload_column: str | None = "text",
                 chunk_size: int = _CHUNK):
    """Dataset over WARC-style shards with typed metadata columns."""
    import ray.data as rd

    return rd.read_datasource(
        make_warc_datasource(paths, meta_fields, payload_column,
                             chunk_size))


def documents_warc(sf_dir: str,
                   meta_columns: tuple[str, ...] = ("doc_id", "lang",
                                                    "n_chars"),
                   payload_column: str | None = "text"):
    """The documents table served from WARC-style shards (export cached).

    Metadata header types follow the parquet schema so the reader's
    output is column-identical to ``read_parquet`` of the same table."""
    import pyarrow.parquet as pq

    out_dir = export_warcish(sf_dir, "documents", meta_columns, "text")
    schema = pq.read_schema(f"{sf_dir}/documents.parquet")
    meta_fields = [(c, schema.field(c).type) for c in meta_columns]
    return read_warcish(out_dir, meta_fields, payload_column)
