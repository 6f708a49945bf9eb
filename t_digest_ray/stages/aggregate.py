"""Ray Data wiring for mergeable sketches.

The scalable topology (SURVEY.md §3, the Ray re-architecture of
MergingDigest.add(List) / MegaMergeTest's partial->merge pattern):

    ds.map_batches(partial_fn, batch_format="pyarrow")     # map-side combine:
        -> rows (key, salt, sketch: binary, n: float64)    #   one sketch per
                                                           #   (batch x key)
    .groupby([key, salt]).map_groups(merge)                # level-1 merge
    .groupby(key).map_groups(merge)                        # level-2 merge
    .map_batches(summarize)                                # query stage

Raw values never shuffle — only serialized sketches (KBs per row), which is
what makes the wide step cheap at 10^12 rows. The salt level bounds the fan-in
of any single merge task for hot keys ("en" at 40% of a web corpus): level-1
fan-in ~ #batches/num_salts, level-2 fan-in = num_salts. Sketch merges are
associative, so the two-level tree gives the same answer (within the
sketch's published bound) as a flat merge — property-tested in
tests/test_ray_aggregate.py.

The merges are canonical one-shot N-way merges (concat all centroid arrays,
one sort, one cluster pass — MergingDigest.java:314-357 semantics), so the
result is independent of the order Ray delivers the partial rows.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64
from ..state.protocol import SketchSpec

SKETCH_COL = "sketch"
COUNT_COL = "n"
KEY_COL = "key"
SALT_COL = "salt"

_GLOBAL_KEY = ""  # constant key used when aggregating without a group key


def make_partial_fn(spec: SketchSpec, value_col: str,
                    key: str | None = None,
                    weight_col: str | None = None,
                    num_salts: int = 8):
    """Build the map-side combine: one serialized sketch per (batch, key).

    Stateless by design — each batch independently becomes <= #keys tiny
    rows, so tasks are cheap, elastic and retry-deterministic (the sketch of
    a batch depends only on the batch's content: values are order-
    canonicalized inside ``update_batch``). The salt is content-derived, so
    a retried task lands in the same level-1 merge group.
    """

    def fn(batch: pa.Table) -> pa.Table:
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        weights = (batch[weight_col].to_numpy(zero_copy_only=False)
                   if weight_col else None)
        out_keys: list[Any] = []
        out_blobs: list[bytes] = []
        out_n: list[float] = []
        if key is None:
            sk = spec.factory()
            sk.update_batch(vals, weights)
            out_keys.append(_GLOBAL_KEY)
            out_blobs.append(sk.to_bytes())
            out_n.append(float(len(vals)))
        else:
            karr = batch[key].to_numpy(zero_copy_only=False)
            order = np.argsort(karr, kind="stable")
            sk_sorted = karr[order]
            uniq, starts = np.unique(sk_sorted, return_index=True)
            bounds = np.append(starts, len(sk_sorted))
            for i, k in enumerate(uniq):
                idx = order[bounds[i]:bounds[i + 1]]
                sk = spec.factory()
                sk.update_batch(vals[idx],
                                None if weights is None else weights[idx])
                out_keys.append(k)
                out_blobs.append(sk.to_bytes())
                out_n.append(float(len(idx)))
        salts = (hash64(np.asarray(out_blobs, dtype=object))
                 % np.uint64(max(num_salts, 1))).astype(np.int32)
        return pa.table({
            KEY_COL: pa.array(out_keys),
            SALT_COL: pa.array(salts),
            SKETCH_COL: pa.array(out_blobs, type=pa.binary()),
            COUNT_COL: pa.array(out_n, type=pa.float64()),
        })

    return fn


def _merge_group(spec: SketchSpec, carry: tuple[str, ...] = (KEY_COL,)):
    """A map_groups body: N partial rows for one group -> 1 row; ``carry``
    lists the group-identity columns copied through."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        merged = spec.merge_bytes(list(g[SKETCH_COL]))
        out = {c: [g[c].iloc[0]] for c in carry}
        out[SKETCH_COL] = [merged.to_bytes()]
        out[COUNT_COL] = [float(g[COUNT_COL].sum())]
        return pd.DataFrame(out)

    return merge


def merge_partials(partials, spec: SketchSpec, num_salts: int = 8,
                   coalesce_blocks: int = 16):
    """The wide half of the pipeline: partial sketch rows
    ``(key, salt, sketch, n)`` -> two-level canonical merge -> one row per
    key. Public so callers that produce partial rows themselves (e.g. a
    generator that sketches in-task) reuse the exact same merge topology.

    ``coalesce_blocks``: the partial rows are KB-sized but inherit the
    input's block COUNT; Ray's sort-based groupby spawns tasks per input
    block, so hundreds of near-empty blocks would pay seconds of pure task
    overhead (measured: 16 s of shuffle on 800 rows from 100 blocks vs <1 s
    coalesced). Repartitioning the tiny rows first makes the wide step cost
    proportional to the data, not to the upstream block count.
    """
    if coalesce_blocks:
        partials = partials.repartition(coalesce_blocks)
    merge = _merge_group(spec)
    if num_salts > 1:
        level1 = partials.groupby([KEY_COL, SALT_COL]).map_groups(
            merge, batch_format="pandas")
    else:
        level1 = partials
    return level1.groupby(KEY_COL).map_groups(merge, batch_format="pandas")


def sketch_by_key(ds, spec: SketchSpec, value_col: str,
                  key: str | None = None,
                  weight_col: str | None = None,
                  num_salts: int = 8,
                  batch_size: int | None = None,
                  coalesce_blocks: int = 16):
    """Full pipeline: partials -> two-level canonical merge.

    Returns a Dataset of rows ``(key, sketch: binary, n: float64)`` — one per
    group (a single row with key "" when ``key is None``).
    """
    partials = ds.map_batches(
        make_partial_fn(spec, value_col, key, weight_col, num_salts),
        batch_format="pyarrow", batch_size=batch_size)
    return merge_partials(partials, spec, num_salts=num_salts,
                          coalesce_blocks=coalesce_blocks)


METRIC_COL = "metric"


def merge_multi_partials(partials, spec: SketchSpec, num_salts: int = 8,
                         coalesce_blocks: int = 16):
    """merge_partials for multi-metric partial rows (METRIC_COL carried)."""
    if coalesce_blocks:
        partials = partials.repartition(coalesce_blocks)
    merge1 = _merge_group(spec, carry=(METRIC_COL, KEY_COL))
    if num_salts > 1:
        level1 = partials.groupby([METRIC_COL, KEY_COL, SALT_COL]).map_groups(
            merge1, batch_format="pandas")
    else:
        level1 = partials
    return level1.groupby([METRIC_COL, KEY_COL]).map_groups(
        merge1, batch_format="pandas")


def multi_sketch_by_key(ds, spec: SketchSpec, value_cols, key: str | None = None,
                        num_salts: int = 8, batch_size: int | None = None,
                        coalesce_blocks: int = 16):
    """One scan, many sketches: per-(metric, key) sketch rows for every
    column in ``value_cols`` from a SINGLE pass over the input.

    At corpus scale the input scan dominates, so computing all metrics'
    partials inside one ``map_batches`` amortizes it; the shuffle still only
    carries serialized sketches (one row per (batch, metric, key)).
    Returns rows ``(metric, key, sketch, n)``.
    """
    value_cols = list(value_cols)
    fns = {vc: make_partial_fn(spec, vc, key, None, num_salts)
           for vc in value_cols}

    def fn(batch: pa.Table) -> pa.Table:
        tables = []
        for vc, pf in fns.items():
            t = pf(batch)
            tables.append(t.append_column(
                METRIC_COL, pa.array([vc] * len(t))))
        return pa.concat_tables(tables)

    partials = ds.map_batches(fn, batch_format="pyarrow",
                              batch_size=batch_size)
    return merge_multi_partials(partials, spec, num_salts=num_salts,
                                coalesce_blocks=coalesce_blocks)


def summarize(ds, spec: SketchSpec, key_name: str = KEY_COL):
    """Query stage: expand each merged sketch row into result columns.

    The iterrows loop is deliberate: the input is the MERGED sketch table
    (one row per key — tens of rows), never per-batch partials; do not
    reuse this on row-counts proportional to the data."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in df.iterrows():
            sk = spec.from_bytes(r[SKETCH_COL])
            out = {key_name: r[KEY_COL], COUNT_COL: r[COUNT_COL]}
            out.update(spec.summarize(sk))
            rows.append(out)
        return pd.DataFrame(rows)

    return ds.map_batches(fn, batch_format="pandas")


def sketch_aggregate_fn(spec: SketchSpec, value_col: str,
                        name: str | None = None):
    """Adapter: any Sketch -> a Ray Data ``AggregateFn`` over ``value_col``.

    The accumulator is the sketch's byte encoding (Arrow-friendly), so this
    composes with ``Dataset.aggregate`` / ``groupby().aggregate`` directly.
    ``sketch_by_key`` is preferred for big inputs because its map-side
    combine pre-shrinks the shuffle; this adapter is the drop-in generic
    form (mirrors the UDAF contract in SURVEY.md §1.2). ``value_col`` is
    required: under groupby the accumulated block also carries the key
    column, so guessing a column would silently sketch the keys.
    """
    from ray.data.aggregate import AggregateFn

    def accumulate_block(acc: bytes, block) -> bytes:
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        sk = spec.from_bytes(acc)
        vals = tbl[value_col].to_numpy(zero_copy_only=False)
        sk.update_batch(vals)
        return sk.to_bytes()

    return AggregateFn(
        init=lambda k: spec.factory().to_bytes(),
        merge=lambda a, b: spec.merge_bytes([a, b]).to_bytes(),
        accumulate_block=accumulate_block,
        finalize=lambda a: a,
        name=name or f"{spec.name}({value_col})",
    )


def hash_bucketed_group_agg(ds, group_cols, aggs: dict,
                            coarse: int | None = None,
                            n_rows: int | None = None):
    """Vectorized many-group aggregation: per-batch pandas partials +
    hash-bucketed vectorized combine.

    Ray's sort-based ``groupby(cols).aggregate(...)`` pays ~1 ms of
    Python per DISTINCT GROUP (measured 170 s for 200k groups on this
    box) — fine for tens of groups, pathological for pair-dedup-shaped
    outputs with one group per candidate pair. This helper keeps every
    step vectorized: each batch is pre-aggregated with a C-level pandas
    groupby (map-side combine), partial rows are hash-bucketed on the
    group key, and each bucket folds its partials with one more pandas
    groupby — cost scales with ROWS, not groups, and no group's data
    spans two tasks.

    ``aggs`` maps ``out_name -> (value_col, how)`` with how in
    ``count | sum | min | max`` (count ignores value_col). Returns a
    Dataset of one row per distinct ``group_cols`` combination.
    """
    import pandas as pd
    import pyarrow as pa

    from ..functions.hashing import hash64, splitmix64
    from .partitioning import coarse_bucket_count

    if coarse is None:
        coarse = coarse_bucket_count(ds, n_rows=n_rows,
                                     rows_per_bucket=262144,
                                     what="hash_bucketed_group_agg")
    group_cols = list(group_cols)
    # partial aggregation per batch; 'count' partials combine by sum
    part_how = {o: (c, {"count": "sum"}.get(h, h))
                for o, (c, h) in aggs.items()}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_cols, sort=False)
        outs = {}
        for out, (col, how) in aggs.items():
            outs[out] = (g.size() if how == "count"
                         else g[col].agg(how))
        p = pd.DataFrame(outs).reset_index()
        h = np.zeros(len(p), dtype=np.uint64)
        for c in group_cols:
            with np.errstate(over="ignore"):
                h = splitmix64(h ^ hash64(p[c].to_numpy()))
        p["_gbucket"] = (h % np.uint64(coarse)).astype(np.int32)
        return p

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_cols, sort=False)
        outs = {out: g[out].agg(how)
                for out, (_c, how) in part_how.items()}
        return pd.DataFrame(outs).reset_index()

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("_gbucket")
            .map_groups(combine, batch_format="pandas"))
