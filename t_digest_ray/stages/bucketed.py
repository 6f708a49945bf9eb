"""Storage-bucketed (shuffle-free) joins.

The technique that makes REPEATED fact-fact joins affordable at 100 TB:
pay one hash-partitioned write per table, then every subsequent join on
that key is a union of B independent per-bucket joins with NO runtime
exchange — the analogue of Hive/Iceberg bucketed tables and Spark's
storage-partitioned join. The reference has no joins at all
(SURVEY.md §2.4); this is engine infrastructure the graft adds.

Layout contract: ``<root>/<name>-<tag>/b=<i>/*.parquet`` where
``tag = sha1(normalized inputs | key | n_buckets | columns)`` (the same
full-path cache discipline as sources/warc.py:46 — ADVICE r4 item 1) and
bucket ``i = splitmix64(key) % n_buckets``. A ``_SUCCESS`` marker makes
the write atomic-at-the-directory level: partial writes are invisible,
re-runs skip finished tables — the resumable-output contract.

The join itself: for each bucket, the probe side streams through
``map_batches`` while an actor pool loads the matching build-side bucket
from storage ONCE in ``__init__`` (never via the driver, never shipped
per batch). Memory per actor = one bucket of the build side — sized by
``n_buckets``, independent of cluster width.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from ..functions.hashing import splitmix64
from .partitioning import actor_pool_bounds

_BUCKET_ROOT = "/tmp/tdr_buckets"


def _bucket_dir(root: str, name: str, sf_dir: str, key: str,
                n_buckets: int, columns: list[str]) -> str:
    tag = hashlib.sha1(
        f"{os.path.normpath(sf_dir)}|{key}|{n_buckets}|"
        f"{','.join(columns)}".encode()).hexdigest()[:10]
    return os.path.join(root, f"{name}-{tag}")


def write_bucketed(ds, dest: str, key: str, n_buckets: int) -> str:
    """Hash-bucket ``ds`` by ``key`` into ``dest/b=<i>/`` partitioned
    parquet. Idempotent: skipped when ``dest/_SUCCESS`` exists."""
    marker = os.path.join(dest, "_SUCCESS")
    if os.path.exists(marker):
        return dest

    def tag(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        bkt = (splitmix64(k) % np.uint64(n_buckets)).astype(np.int32)
        return b.append_column("b", pa.array(bkt))

    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        dest, partition_cols=["b"])
    with open(marker, "w") as f:
        f.write("ok")
    return dest


class _BucketLookup:
    """Actor that loads ONE build-side bucket from storage in __init__
    and inner-joins every probe batch against it (storage-partitioned
    join: no shuffle, no driver materialization, no per-batch ship).
    The build side must be UNIQUE on its key (a PK/dimension side) —
    asserted at load."""

    def __init__(self, build_dir: str, bucket: int, probe_key: str,
                 build_key: str, build_cols: list[str]):
        import pyarrow.dataset as pads
        path = os.path.join(build_dir, f"b={bucket}")
        if os.path.isdir(path):
            t = pads.dataset(path, format="parquet").to_table(
                columns=[build_key] + build_cols)
        else:                         # empty bucket on the build side
            t = pa.table({c: pa.array([], type=pa.int64())
                          for c in [build_key] + build_cols})
        keys = t[build_key].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        self.probe_key = probe_key
        self.keys = keys[order]
        assert len(np.unique(self.keys)) == len(self.keys), \
            "bucketed_join build side must be unique on its key"
        self.cols = {c: t[c].take(pa.array(order)) for c in build_cols}

    def __call__(self, batch: pa.Table) -> pa.Table:
        probe = batch[self.probe_key].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.keys, probe)
        pos = np.clip(pos, 0, max(len(self.keys) - 1, 0))
        hit = np.zeros(len(probe), dtype=bool) if not len(self.keys) \
            else self.keys[pos] == probe
        out = batch.filter(pa.array(hit))
        take = pa.array(pos[hit])
        for c, col in self.cols.items():
            out = out.append_column(c, col.take(take))
        return out


def bucketed_join(probe_sf_dir: str, probe_table: str, build_sf_dir: str,
                  build_table: str, probe_key: str, build_key: str,
                  probe_cols: list[str], build_cols: list[str],
                  n_buckets: int = 8, root: str = _BUCKET_ROOT):
    """Bucket both tables once (cached), then join bucket-by-bucket with
    zero shuffle. Returns one Dataset: the union of B per-bucket joins,
    each an independent streaming sub-pipeline (failed buckets retry
    alone — the resumable unit is the bucket)."""
    import ray.data

    def load(sf_dir, table, k, cols):
        ds = ray.data.read_parquet(
            os.path.join(sf_dir, f"{table}.parquet"),
            columns=[k] + cols)
        dest = _bucket_dir(root, table, sf_dir, k, n_buckets, cols)
        return write_bucketed(ds, dest, k, n_buckets)

    probe_dir = load(probe_sf_dir, probe_table, probe_key, probe_cols)
    build_dir = load(build_sf_dir, build_table, build_key, build_cols)

    parts = []
    lo, hi = actor_pool_bounds()
    per_bucket = (max(1, lo // n_buckets), max(1, hi // n_buckets))
    for i in range(n_buckets):
        pdir = os.path.join(probe_dir, f"b={i}")
        if not os.path.isdir(pdir):   # empty bucket on the probe side
            continue
        p = ray.data.read_parquet(pdir,
                                  columns=[probe_key] + probe_cols)
        parts.append(p.map_batches(
            _BucketLookup, batch_format="pyarrow",
            concurrency=per_bucket,
            fn_constructor_kwargs={
                "build_dir": build_dir, "bucket": i,
                "probe_key": probe_key, "build_key": build_key,
                "build_cols": build_cols}))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
