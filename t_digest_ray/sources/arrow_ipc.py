"""Arrow IPC (Feather v2) stream source — the fifth ingest format.

Shards are written as Arrow IPC *streams* (``pa.ipc.new_stream``), the
zero-parse wire format: reading back is a batch-at-a-time walk of the
stream (``open_stream`` yields record batches incrementally), so a shard
never has to fit in memory and column projection happens per batch with
no decode cost. Same FileBasedDatasource plumbing as the WARC source
(sources/warc.py) — Ray schedules one read task per shard and the
streaming executor backpressures on the batch iterator.
"""

from __future__ import annotations

import hashlib
import os
import uuid

import pyarrow as pa

_N_SHARDS = 8


def _cache_dir(sf_dir: str, table: str, columns: list[str]) -> str:
    # Key on the sha1 of the NORMALIZED FULL path + columns (same
    # discipline as warc.py/text_files.py) so two datasets whose
    # directories share a basename never reuse each other's shards.
    key = f"{os.path.normpath(sf_dir)}|{','.join(columns)}|ipc"
    tag = hashlib.sha1(key.encode()).hexdigest()[:10]
    return os.path.join("/tmp", "tdr_srccache", f"{table}-ipc-{tag}")


def export_ipc(sf_dir: str, table: str, columns: list[str]) -> str:
    """Convert {sf_dir}/{table}.parquet into sharded IPC streams; cached
    (atomic tmp+rename per shard, same discipline as the other source
    exports)."""
    import pyarrow.parquet as pq

    out_dir = _cache_dir(sf_dir, table, columns)
    shards = [os.path.join(out_dir, f"part-{i}.arrows")
              for i in range(_N_SHARDS)]
    if all(os.path.exists(s) for s in shards):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)
    n = t.num_rows
    step = -(-n // _N_SHARDS)
    for i, dest in enumerate(shards):
        part = t.slice(i * step, step)
        tmp = f"{dest}.tmp-{uuid.uuid4().hex[:8]}"
        with pa.OSFile(tmp, "wb") as sink:
            with pa.ipc.new_stream(sink, part.schema) as writer:
                for b in part.to_batches(max_chunksize=4096):
                    writer.write_batch(b)
        os.rename(tmp, dest)
    return out_dir


def make_ipc_datasource(paths, columns: list[str] | None = None):
    from ray.data.datasource import FileBasedDatasource

    class IpcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["arrows"]

        def _read_stream(self, f, path: str):
            reader = pa.ipc.open_stream(f)
            for batch in reader:
                t = pa.Table.from_batches([batch])
                if columns is not None:
                    t = t.select(columns)
                yield t

    return IpcDatasource(paths, file_extensions=["arrows"])


def read_ipc(paths, columns: list[str] | None = None):
    """Dataset over Arrow IPC stream shards with per-batch projection."""
    import ray.data as rd

    return rd.read_datasource(make_ipc_datasource(paths, columns))


def documents_ipc(sf_dir: str, columns: list[str]):
    """The documents table served from IPC stream shards (export
    cached)."""
    out_dir = export_ipc(sf_dir, "documents", columns)
    return read_ipc(out_dir, columns)
