"""Exact relational operators expressed Ray-Data-first.

These are the engine's SQL-expressible companions (FIXTURES.md §5): each has
a DuckDB oracle in ``__ray_entry__.oracle_sql`` and exercises a core Ray Data
primitive — groupby-aggregate, map_groups, broadcast join, distinct, top-k.
``exact_quantiles_by_key`` is the distributed port of the reference's exact
oracle (Dist.java:47-60), matching DuckDB ``quantile_disc`` exactly:
value at index ``max(ceil(q*n) - 1, 0)`` of the sorted group.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _round_col(df: pd.DataFrame, cols, nd: int = 4) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].round(nd)
    return df


def grouped_stats(ds, key: str, value: str, out_names: dict[str, str],
                  nd: int = 4):
    """count / sum / avg / min / max of ``value`` per ``key`` (exact)."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    out = ds.groupby(key).aggregate(
        Count(alias_name=out_names.get("count", "cnt")),
        Sum(value, alias_name=out_names.get("sum", "sum_v")),
        Mean(value, alias_name=out_names.get("avg", "avg_v")),
        Min(value, alias_name=out_names.get("min", "min_v")),
        Max(value, alias_name=out_names.get("max", "max_v")),
    )

    def rnd(df: pd.DataFrame) -> pd.DataFrame:
        return _round_col(df, [out_names.get("sum", "sum_v"),
                               out_names.get("avg", "avg_v")], nd)

    return out.map_batches(rnd, batch_format="pandas")


def exact_quantiles_by_key(ds, key: str, value: str,
                           qs=(0.25, 0.5, 0.75)):
    """Per-group exact quantiles (duckdb quantile_disc convention).

    Groups must individually fit in a worker's heap — this is the exact
    small-scale oracle operator (Dist.java port), not the sketch path.
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value].to_numpy())
        n = len(v)
        row = {key: [g[key].iloc[0]]}
        for q in qs:
            idx = max(int(math.ceil(q * n)) - 1, 0)
            row[f"p{int(q * 100)}"] = [float(v[idx])]
        return pd.DataFrame(row)

    return ds.groupby(key).map_groups(per_group, batch_format="pandas")


def dedup_exact(ds, content_col: str, id_col: str,
                n_rows: int | None = None):
    """Exact dedup: keep the row with the smallest id per distinct content.

    Scale path: hash the content inside ``map_batches`` (vectorized) so the
    shuffle key is a fixed-width uint64, then pick the min-id row per group
    via the hash-bucketed vectorized combine — there is one group per
    DISTINCT DOCUMENT (billions at 10^12 rows), so Ray's sort-based
    ``groupby.aggregate`` (~1 ms of Python per group) is pathological here.
    Returns (id, n_dupes) per kept row.
    """
    from ..functions.hashing import hash64
    from ..stages.aggregate import hash_bucketed_group_agg

    if n_rows is None:
        from ..stages.partitioning import cheap_row_count
        n_rows = cheap_row_count(ds)

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash64(batch[content_col].to_numpy(zero_copy_only=False))
        return pa.table({"content_hash": pa.array(h.astype(np.int64)),
                         id_col: batch[id_col]})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    deduped = hash_bucketed_group_agg(
        hashed, ["content_hash"],
        {id_col: (id_col, "min"), "n_dupes": (id_col, "count")},
        n_rows=n_rows)
    return deduped.select_columns([id_col, "n_dupes"])


def cluster_size_histogram(ds, content_col: str,
                           n_rows: int | None = None):
    """Duplicate-cluster-size histogram: for each distinct content value,
    the cluster size (row count), then the number of clusters per size —
    the dedup-audit report ("how much of the corpus is 2×/3×/k×
    duplicated?").

    Topology: only the 8-byte content hash rides the wide shuffle
    (hash-bucketed vectorized combine, cost ∝ rows); the second groupby
    runs over O(distinct sizes) rows — a few dozen. Same content-hash
    identity convention as dedup_exact (64-bit collisions negligible and
    documented there).
    """
    from ray.data.aggregate import Count

    from ..functions.hashing import hash64
    from ..stages.aggregate import hash_bucketed_group_agg

    if n_rows is None:
        from ..stages.partitioning import cheap_row_count
        n_rows = cheap_row_count(ds)

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash64(batch[content_col].to_numpy(zero_copy_only=False))
        return pa.table({"content_hash": pa.array(h.astype(np.int64))})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    per_cluster = hash_bucketed_group_agg(
        hashed, ["content_hash"],
        {"cluster_size": ("content_hash", "count")},
        n_rows=n_rows)
    out = (per_cluster.groupby("cluster_size")
           .aggregate(Count(alias_name="n_clusters")))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["cluster_size"] = df["cluster_size"].astype(np.int64)
        df["n_clusters"] = df["n_clusters"].astype(np.int64)
        return df

    return out.map_batches(fin, batch_format="pandas")


def key_skew_report(ds, key: str, n_rows: int | None = None):
    """Shuffle-planning skew diagnostic: the distribution of group sizes
    for a prospective partition key — row count, distinct keys, max
    group size, exact disc p50/p90/p99 of group sizes, and the hottest
    key's share in ppm (integer arithmetic, order-independent). This is
    the measurement behind the engine's hot-key salting contracts
    (SURVEY §2.4: "skew-aware salting for hot languages/hosts").

    Topology: per-key counts via the hash-bucketed vectorized combine
    (cost ∝ rows); the quantile pass runs over one row PER DISTINCT KEY
    — a diagnostic-scale table (the same contract as the exact-oracle
    quantile path).
    """
    from ..stages.aggregate import hash_bucketed_group_agg

    if n_rows is None:
        from ..stages.partitioning import cheap_row_count
        n_rows = cheap_row_count(ds)

    counts = hash_bucketed_group_agg(
        ds.select_columns([key]), [key], {"cnt": (key, "count")},
        n_rows=n_rows)

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        c = np.sort(df["cnt"].to_numpy(dtype=np.int64))
        n_keys = len(c)
        total = int(c.sum())
        row = {"n_rows": [np.int64(total)],
               "n_keys": [np.int64(n_keys)],
               "max_count": [np.int64(c[-1])]}
        for q in (0.5, 0.9, 0.99):
            row[f"p{int(q * 100)}_count"] = [np.int64(
                c[max(int(math.ceil(q * n_keys)) - 1, 0)])]
        row["top_share_ppm"] = [np.int64(c[-1] * 1_000_000 // total)]
        return pd.DataFrame(row)

    # the counts table is one row per distinct key; fold it in one task
    return counts.repartition(1).map_batches(
        summarize, batch_format="pandas",
        batch_size=None)


def top_k_by_count(ds, key: str, k: int, count_name: str = "cnt"):
    """Top-k keys by row count with a deterministic (count desc, key asc)
    tie-break. Pre-aggregated per batch before the shuffle."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        arr = batch[key].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(arr, return_counts=True)
        return pa.table({key: pa.array(uniq),
                         "partial": pa.array(counts.astype(np.int64))})

    counts = (ds.map_batches(partial_counts, batch_format="pyarrow")
              .groupby(key).aggregate(Sum("partial", alias_name=count_name)))
    # top-k of a tiny aggregate: sort then limit
    top = counts.sort([count_name, key], descending=[True, False]).limit(k)
    return top


def iqr_outlier_stats(ds, key: str, value: str, k: float = 1.5):
    """Tukey IQR outlier report per key: exact disc quantiles Q1/Q3, the
    group size and the count outside ``[Q1 - k*IQR, Q3 + k*IQR]``. The
    fence arithmetic is ONE float expression over the exact integer
    quantiles, so the counts are bit-reproducible in SQL. Per-group
    exact (oracle-scale op, same contract as exact_quantiles_by_key);
    the 100-TB path for the same filter is quantile sketches + a
    broadcast of the per-key fences."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value].to_numpy())
        n = len(v)
        q1 = float(v[max(int(math.ceil(0.25 * n)) - 1, 0)])
        q3 = float(v[max(int(math.ceil(0.75 * n)) - 1, 0)])
        iqr = q3 - q1
        lo, hi = q1 - k * iqr, q3 + k * iqr
        vf = v.astype(np.float64)
        out = int(((vf < lo) | (vf > hi)).sum())
        return pd.DataFrame({key: [g[key].iloc[0]], "q1": [q1],
                             "q3": [q3], "n_total": [np.int64(n)],
                             "n_outliers": [np.int64(out)]})

    return ds.groupby(key).map_groups(per_group, batch_format="pandas")


def rollup_stats(ds, keys, value: str, all_label: str = "ALL"):
    """Hierarchical ROLLUP aggregate (count / sum / min / max of ``value``
    at every prefix level of ``keys``): the input is scanned ONCE for the
    finest (all-keys) level; every coarser level is derived by
    re-aggregating the finest result — counts/sums add, min/max of group
    min/max — which is KB-sized (one row per finest group), so the extra
    levels cost no second pass over the data. Rolled-up key columns carry
    ``all_label`` (the COALESCE convention of SQL GROUP BY ROLLUP).

    Partitioning assumption: the FINEST group count fits the driver for
    the derive step (same bound as any top-k/report consumer of the
    aggregate); the wide shuffle itself is the one Ray groupby.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    keys = list(keys)
    finest = (ds.groupby(keys)
              .aggregate(Count(alias_name="n_rows"),
                         Sum(value, alias_name="sum_v"),
                         Min(value, alias_name="min_v"),
                         Max(value, alias_name="max_v"))).to_pandas()
    finest["sum_v"] = finest["sum_v"].astype(np.int64)

    levels = [finest]
    for depth in range(len(keys) - 1, -1, -1):
        kept = keys[:depth]
        g = finest.groupby(kept, sort=False) if kept else finest
        agg = (g.agg(n_rows=("n_rows", "sum"), sum_v=("sum_v", "sum"),
                     min_v=("min_v", "min"), max_v=("max_v", "max"))
               if kept else pd.DataFrame({
                   "n_rows": [finest["n_rows"].sum()],
                   "sum_v": [finest["sum_v"].sum()],
                   "min_v": [finest["min_v"].min()],
                   "max_v": [finest["max_v"].max()]}))
        if kept:
            agg = agg.reset_index()
        for c in keys[depth:]:
            agg[c] = all_label
        levels.append(agg[keys + ["n_rows", "sum_v", "min_v", "max_v"]])

    out = pd.concat(levels, ignore_index=True)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["sum_v"] = out["sum_v"].astype(np.int64)
    return out


def cube_stats(ds, keys, value: str, all_label: str = "ALL"):
    """GROUP BY CUBE aggregate: every SUBSET of ``keys`` (2^k grouping
    sets), all derived from the single finest-level scan the same way as
    rollup_stats — counts/sums re-add, min/max re-fold over the KB-sized
    finest table, so the extra 2^k - 1 levels cost no second data pass.
    Same driver-side finest-group bound as rollup_stats.
    """
    from itertools import combinations

    from ray.data.aggregate import Count, Max, Min, Sum

    keys = list(keys)
    finest = (ds.groupby(keys)
              .aggregate(Count(alias_name="n_rows"),
                         Sum(value, alias_name="sum_v"),
                         Min(value, alias_name="min_v"),
                         Max(value, alias_name="max_v"))).to_pandas()
    finest["sum_v"] = finest["sum_v"].astype(np.int64)

    levels = []
    for r in range(len(keys), -1, -1):
        for kept in combinations(keys, r):
            kept = list(kept)
            if len(kept) == len(keys):
                agg = finest.copy()
            elif kept:
                agg = (finest.groupby(kept, sort=False)
                       .agg(n_rows=("n_rows", "sum"),
                            sum_v=("sum_v", "sum"),
                            min_v=("min_v", "min"),
                            max_v=("max_v", "max")).reset_index())
            else:
                agg = pd.DataFrame({
                    "n_rows": [finest["n_rows"].sum()],
                    "sum_v": [finest["sum_v"].sum()],
                    "min_v": [finest["min_v"].min()],
                    "max_v": [finest["max_v"].max()]})
            for c in keys:
                if c not in kept:
                    agg[c] = all_label
            levels.append(agg[keys + ["n_rows", "sum_v",
                                      "min_v", "max_v"]])

    out = pd.concat(levels, ignore_index=True)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["sum_v"] = out["sum_v"].astype(np.int64)
    return out


def mad_stats(ds, key: str, value: str):
    """Per-key MEDIAN ABSOLUTE DEVIATION (disc convention): median via
    the exact per-group path, then the disc-median of |x - median| in a
    second pass with the per-key medians broadcast (a handful of
    floats via closure). Completes the robust-scale family alongside
    IQR fences and exact-moment z-scores; same heap-bound exact-oracle
    contract as exact_quantiles_by_key.
    """
    meds = exact_quantiles_by_key(ds, key, value, qs=(0.5,)).to_pandas()
    med_by_key = dict(zip(meds[key], meds["p50"]))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        kval = g[key].iloc[0]
        med = float(med_by_key[kval])
        dev = np.sort(np.abs(g[value].to_numpy(dtype=np.float64) - med))
        n = len(dev)
        idx = max(int(math.ceil(0.5 * n)) - 1, 0)
        return pd.DataFrame({key: [kval], "n": [np.int64(n)],
                             "median_v": [med], "mad": [float(dev[idx])]})

    return ds.groupby(key).map_groups(per_group, batch_format="pandas")


def pivot_counts(ds, row_key: str, col_key: str, col_values,
                 prefix: str = "n_"):
    """Crosstab / PIVOT: per ``row_key`` one row with a count column per
    ``col_key`` value (the wide-report shape). One vectorized per-batch
    partial (rows × |col_values| int64 cells) rides the exchange; the
    pivot itself happens in the combiner, so no second shuffle and no
    per-row Python.
    """
    from ray.data.aggregate import Sum

    col_values = list(col_values)

    def partial(b: pa.Table) -> pa.Table:
        rk = b[row_key].to_numpy(zero_copy_only=False)
        ck = b[col_key].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({row_key: rk})
        for v in col_values:
            df[f"{prefix}{v}"] = (ck == v).astype(np.int64)
        g = df.groupby(row_key, as_index=False, sort=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    aggs = [Sum(f"{prefix}{v}", alias_name=f"{prefix}{v}")
            for v in col_values]
    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(row_key).aggregate(*aggs))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        for v in col_values:
            df[f"{prefix}{v}"] = df[f"{prefix}{v}"].astype(np.int64)
        return df

    return out.map_batches(fin, batch_format="pandas")


def distinct_count_by_key(ds, key: str, value: str, out_name: str):
    """Exact count(distinct value) per key: dedup on (key, value) pairs
    inside each batch, then a global pair-dedup + count."""

    from ray.data.aggregate import Sum

    from ..stages.aggregate import hash_bucketed_group_agg

    def pairs(batch: pa.Table) -> pa.Table:
        t = batch.select([key, value])
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    # pair dedup via the vectorized hash-bucketed aggregate (there is one
    # group per distinct value at scale — Ray's sort-based multi-column
    # aggregate pays ~1 ms of Python per group), then a per-key count of
    # the distinct pairs (vectorized partial + a tiny single-key Sum)
    deduped = hash_bucketed_group_agg(
        ds.map_batches(pairs, batch_format="pyarrow"),
        [key, value], {"_c": (key, "count")})

    def per_key_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False).size()
        return pd.DataFrame({key: g.index, "_part": g.to_numpy()})

    return (deduped.map_batches(per_key_partial, batch_format="pandas")
            .groupby(key)
            .aggregate(Sum("_part", alias_name=out_name)))


def hash_join(left, right, on: str, left_cols, right_cols,
              coarse: int | None = None, n_rows: int | None = None,
              types: dict | None = None, how: str = "inner"):
    """Distributed hash equi-join (``how`` = "inner", "left" or
    "full") of two Datasets on ``on``.

    LEFT/FULL join: unmatched rows survive with the other side's
    columns null (the per-bucket merge emits them via ``from_pandas``
    null conversion), so a downstream COALESCE/fillna sees proper Arrow
    nulls, not NaN-coerced floats. FULL OUTER works per bucket because
    hash co-partitioning sends BOTH sides of any key to the same
    bucket — a key absent from one side is absent from that bucket's
    side exactly.

    Ray Data (2.49) has no native join; this is the shuffle join the
    engine uses when NEITHER side fits in memory (use
    ``broadcast_join_count`` / a plasma lookup when one side is a
    dimension table). Both sides are tagged with ``hash(on) % coarse``
    and co-partitioned in ONE union+groupby shuffle; each bucket is then
    a vectorized pandas merge. Same topology as ``windows.asof_join``.

    Partitioning assumption (documented contract): one bucket's rows
    from both sides must fit in a worker's heap — ``coarse`` scales with
    the combined metadata row count (~256k rows/bucket). A pathological
    hot key (one key = whole dataset) needs pre-aggregation before the
    join, same as any hash-partitioned engine.

    Returns columns ``[on] + left_cols + right_cols``. Rows ride the
    shuffle with the other side's columns as nulls (one unified Arrow
    schema for the union).

    ``types`` (optional): explicit ``{col: pyarrow.DataType}`` for the
    output columns. Pass it whenever an input is a mapped/joined Dataset:
    ``Dataset.schema()`` on those EXECUTES the upstream plan to produce a
    block (for a join-of-joins input that re-runs the whole upstream
    shuffle), whereas on parquet-backed reads it is a metadata lookup.
    """
    from ..functions.hashing import hash64
    from ..stages.partitioning import cheap_row_count, coarse_bucket_count

    if coarse is None:
        if n_rows is None:
            nl, nr = cheap_row_count(left), cheap_row_count(right)
            n_rows = nl + nr if nl is not None and nr is not None else None
        coarse = coarse_bucket_count(n_rows=n_rows,
                                     rows_per_bucket=262144,
                                     what="hash_join")
    left_cols = list(left_cols)
    right_cols = list(right_cols)
    # one unified Arrow schema for the union: the absent side's columns
    # are typed nulls (schema() is a metadata read for parquet sources;
    # explicit ``types`` skips schema inspection entirely)
    types = dict(types) if types else {}
    for d, cs in ((left, [on] + left_cols), (right, right_cols)):
        cs = [c for c in cs if c not in types]
        if not cs:
            continue
        sch = d.schema()
        sch = getattr(sch, "base_schema", sch)
        if hasattr(sch, "field"):  # pyarrow schema (parquet-backed)
            for c in cs:
                types[c] = sch.field(c).type
        else:  # PandasBlockSchema: parallel names/types of numpy dtypes
            by_name = dict(zip(sch.names, sch.types))
            for c in cs:
                t = by_name[c]
                types[c] = (pa.string() if t == object
                            else pa.from_numpy_dtype(t))

    def tag(side: int, own_cols):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch[on].to_numpy(zero_copy_only=False)
            n = len(keys)
            cols = {
                "bucket": pa.array((hash64(keys)
                                    % np.uint64(coarse)).astype(np.int32)),
                on: batch[on],
                "is_left": pa.array(np.full(n, side, dtype=np.int8)),
            }
            for c in left_cols + right_cols:
                cols[c] = (batch[c] if c in own_cols
                           else pa.nulls(n, type=types[c]))
            return pa.table(cols)
        return fn

    tagged = (left.map_batches(tag(1, left_cols), batch_format="pyarrow")
              .union(right.map_batches(tag(0, right_cols),
                                       batch_format="pyarrow")))

    # the inner join drops every null, but the union's null-padding made
    # pandas promote int columns to float64 inside each bucket frame —
    # emit Arrow with the declared source types so the output is
    # type-stable (joins compose: this output may be the next join's
    # hash-key input, where float64 vs int64 keys would silently miss)
    out_fields = [(on, types[on])] + [(c, types[c])
                                      for c in left_cols + right_cols]
    out_schema = pa.schema(out_fields)

    if how not in ("inner", "left", "full"):
        raise ValueError(
            f"how must be 'inner', 'left' or 'full', got {how!r}")
    pd_how = {"inner": "inner", "left": "left", "full": "outer"}[how]

    def bucket_join(g: pd.DataFrame) -> pa.Table:
        l = g[g["is_left"] == 1][[on] + left_cols]
        r = g[g["is_left"] == 0][[on] + right_cols]
        j = l.merge(r, on=on, how=pd_how)
        if how == "inner":
            return pa.table({c: pa.array(j[c].to_numpy(), type=t)
                             for c, t in out_fields},
                            schema=out_schema)
        # left/full join: unmatched columns are NaN in the merged
        # frame; from_pandas converts them to typed Arrow nulls (a
        # plain to_numpy() would coerce int columns to float64)
        return pa.table({c: pa.array(j[c], type=t, from_pandas=True)
                         for c, t in out_fields},
                        schema=out_schema)

    return tagged.groupby("bucket").map_groups(bucket_join,
                                               batch_format="pandas")


def hash_semi_anti_join(left, right, on: str, left_cols,
                        anti: bool = False,
                        coarse: int | None = None,
                        n_rows: int | None = None,
                        types: dict | None = None):
    """Distributed semi (``anti=False``) or anti (``anti=True``) equi-join:
    keep left rows whose ``on`` key does / does not appear in ``right``.

    The training-data use is eval decontamination: ``right`` is the
    contamination list (e.g. normalized-text hashes of an eval set),
    ``left`` the corpus, ``anti=True`` keeps the clean rows. Same
    one-shuffle co-partition as ``hash_join`` (hash(on) % coarse buckets),
    but the right side ships ONLY its key column and each bucket is one
    vectorized ``isin`` — no pair blowup, output rows <= left rows, so a
    hot key cannot explode the join (unlike inner join, where it must be
    pre-aggregated). Use ``distinct.bloom_semi_join`` instead when an
    approximate prefilter + local verify beats a full shuffle.

    Returns left's ``[on] + left_cols`` with source types preserved.
    """
    from ..functions.hashing import hash64
    from ..stages.partitioning import cheap_row_count, coarse_bucket_count

    if coarse is None:
        if n_rows is None:
            nl, nr = cheap_row_count(left), cheap_row_count(right)
            n_rows = nl + nr if nl is not None and nr is not None else None
        coarse = coarse_bucket_count(n_rows=n_rows,
                                     rows_per_bucket=262144,
                                     what="hash_semi_anti_join")
    left_cols = list(left_cols)
    # explicit ``types`` skips schema inspection (Dataset.schema() on a
    # mapped/joined input executes its upstream plan; see hash_join)
    types = dict(types) if types else {}
    missing = [c for c in [on] + left_cols if c not in types]
    if missing:
        sch = left.schema()
        sch = getattr(sch, "base_schema", sch)
        if hasattr(sch, "field"):
            for c in missing:
                types[c] = sch.field(c).type
        else:
            by_name = dict(zip(sch.names, sch.types))
            for c in missing:
                t = by_name[c]
                types[c] = (pa.string() if t == object
                            else pa.from_numpy_dtype(t))

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch[on].to_numpy(zero_copy_only=False)
            n = len(keys)
            cols = {
                "bucket": pa.array((hash64(keys)
                                    % np.uint64(coarse)).astype(np.int32)),
                on: batch[on].cast(types[on]),
                "is_left": pa.array(np.full(n, side, dtype=np.int8)),
            }
            for c in left_cols:
                cols[c] = (batch[c] if side == 1
                           else pa.nulls(n, type=types[c]))
            return pa.table(cols)
        return fn

    tagged = (left.map_batches(tag(1), batch_format="pyarrow")
              .union(right.select_columns([on])
                     .map_batches(tag(0), batch_format="pyarrow")))

    out_fields = [(on, types[on])] + [(c, types[c]) for c in left_cols]
    out_schema = pa.schema(out_fields)

    def bucket_filter(g: pd.DataFrame) -> pa.Table:
        is_l = g["is_left"].to_numpy() == 1
        lhs = g.loc[is_l]
        hit = lhs[on].isin(g.loc[~is_l, on]).to_numpy()
        keep = lhs.loc[~hit if anti else hit]
        return pa.table({c: pa.array(keep[c].to_numpy(), type=t)
                         for c, t in out_fields}, schema=out_schema)

    return tagged.groupby("bucket").map_groups(bucket_filter,
                                               batch_format="pandas")


def broadcast_join_count(ds, small_df: pd.DataFrame, left_key: str,
                         right_key: str, label_col: str,
                         value: str, out_names: dict[str, str],
                         nd: int = 4):
    """Broadcast hash join (small side shipped via ray.put once) followed by
    a grouped count/avg — the no-shuffle join pattern for dimension tables."""
    import ray

    # Broadcast the small side ONCE as sorted parallel arrays (zero-copy
    # ray.get for the int keys) and resolve per batch with a vectorized
    # searchsorted + Arrow take — no per-element Python dict lookups.
    order = np.argsort(small_df[right_key].to_numpy(), kind="stable")
    keys_sorted = np.ascontiguousarray(
        small_df[right_key].to_numpy()[order])
    labels_sorted = [str(x) for x in small_df[label_col].to_numpy()[order]]
    ref = ray.put((keys_sorted, labels_sorted))

    class Joiner:
        def __init__(self):
            self.keys, labels = ray.get(ref)
            self.labels = pa.array(labels, type=pa.string())

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch[left_key].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, keys)
            pos_c = np.minimum(pos, len(self.keys) - 1)
            hit = self.keys[pos_c] == keys
            labels = self.labels.take(
                pa.array(np.where(hit, pos_c, 0), type=pa.int64()))
            if not hit.all():
                labels = pc.if_else(pa.array(hit), labels,
                                    pa.scalar(None, type=pa.string()))
            return batch.append_column(label_col, labels)

    # Size the actor pool to the cluster instead of a hardcoded constant
    # (r3 verdict: concurrency=2 starved the stage at 32 CPUs). An
    # autoscaling (min, max) range lets Ray stop short when the input has
    # fewer blocks than CPUs.
    cpus = int(ray.cluster_resources().get("CPU", 8))
    joined = ds.map_batches(Joiner, batch_format="pyarrow",
                            concurrency=(2, max(2, cpus)))
    return grouped_stats(joined, label_col, value, out_names, nd)


def range_join_count(left, right, left_val: str, right_val: str,
                     delta_units: int, grid: float = 1e6,
                     out_div: int | None = None,
                     out_name: str = "bucket"):
    """Distributed RANGE (band) join pair-count: pairs (a, b) with
    ``|q(a) - q(b)| <= delta_units`` where ``q(x) = floor(x*grid + 0.5)``
    — tolerance matching on an exact integer grid, so the predicate has
    no float-boundary ambiguity and an exact SQL oracle.

    Topology (the operator Ray Data lacks natively): quantize both
    sides; the LEFT row lives in bucket ``q // delta_units`` only, the
    RIGHT row is replicated to buckets {k-1, k, k+1} — every qualifying
    pair co-locates in exactly the left row's bucket (bucket width =
    the band width), nothing is double-counted. One union+groupby
    co-partitions both sides; inside each bucket the rights are sorted
    once and every left counts its matches with two vectorized
    searchsorted probes — O((nL + nR) log nR) per bucket, never an
    all-pairs materialization. Per-bucket partial counts (grouped by
    ``q // out_div``) ride the second tiny shuffle.

    Partitioning assumption (same contract as ``hash_join``): one value
    band's rows must fit a worker. A pathological value distribution
    (everything inside one band) needs a salted two-level count.
    """
    from ray.data.aggregate import Sum

    if out_div is None:
        out_div = delta_units * 200

    def quant(col: str, is_left: bool):
        def fn(b: pa.Table) -> pa.Table:
            v = b[col].to_numpy(zero_copy_only=False)
            q = np.floor(v * grid + 0.5).astype(np.int64)
            k = q // np.int64(delta_units)
            if is_left:
                return pa.table({"bkt": pa.array(k), "q": pa.array(q),
                                 "is_left": pa.array(
                                     np.ones(len(q), dtype=np.int8))})
            reps = np.concatenate([k - 1, k, k + 1])
            return pa.table({"bkt": pa.array(reps),
                             "q": pa.array(np.tile(q, 3)),
                             "is_left": pa.array(
                                 np.zeros(3 * len(q), dtype=np.int8))})
        return fn

    tagged = (left.map_batches(quant(left_val, True),
                               batch_format="pyarrow")
              .union(right.map_batches(quant(right_val, False),
                                       batch_format="pyarrow")))

    def bucket_count(g: pd.DataFrame) -> pa.Table:
        is_l = g["is_left"].to_numpy() == 1
        ql = g["q"].to_numpy()[is_l]
        qr = np.sort(g["q"].to_numpy()[~is_l])
        if not len(ql) or not len(qr):
            return pa.table({out_name: pa.array([], type=pa.int64()),
                             "_n": pa.array([], type=pa.int64())})
        lo = np.searchsorted(qr, ql - delta_units, side="left")
        hi = np.searchsorted(qr, ql + delta_units, side="right")
        n = (hi - lo).astype(np.int64)
        keys = ql // np.int64(out_div)
        uk, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, n)
        return pa.table({out_name: pa.array(uk), "_n": pa.array(sums)})

    partial = tagged.groupby("bkt").map_groups(bucket_count,
                                               batch_format="pandas")
    out = partial.groupby(out_name).aggregate(
        Sum("_n", alias_name="n_pairs"))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_pairs"] > 0].copy()
        df["n_pairs"] = df["n_pairs"].astype(np.int64)
        return df

    return out.map_batches(fin, batch_format="pandas")


def topk_other_rollup(ds, key: str, sub: str, k: int = 2):
    """Reporting rollup: per key the top-k sub-categories by count
    (count desc, sub asc tie-break) each with their rank, plus ONE
    'OTHER' row aggregating every remaining sub-category (emitted only
    when something remains). Counts combine per batch; the finalize
    runs per key on the category-sized aggregated table.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({key: b[key].to_numpy(zero_copy_only=False),
                           sub: b[sub].to_numpy(zero_copy_only=False)})
        g = df.groupby([key, sub], as_index=False, sort=False).size()
        g = g.rename(columns={"size": "partial"})
        g["partial"] = g["partial"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([key, sub])
              .aggregate(Sum("partial", alias_name="cnt")))

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cnt", sub],
                          ascending=[False, True]).reset_index(drop=True)
        top = g.iloc[:k]
        rows = pd.DataFrame({
            key: top[key].to_numpy(),
            "category": top[sub].to_numpy(),
            "cnt": top["cnt"].to_numpy(dtype=np.int64),
            "rank": np.arange(1, len(top) + 1, dtype=np.int64)})
        rest = g.iloc[k:]
        if len(rest):
            rows = pd.concat([rows, pd.DataFrame({
                key: [g[key].iloc[0]], "category": ["OTHER"],
                "cnt": np.array([rest["cnt"].sum()], dtype=np.int64),
                "rank": np.array([0], dtype=np.int64)})],
                ignore_index=True)
        return rows

    return counts.groupby(key).map_groups(finalize,
                                          batch_format="pandas")


def latest_snapshot_stats(ds, key_col: str, ts_col: str, seq_col: str,
                          op_col: str, attr_col: str, cents_col: str,
                          delete_op: str = "D"):
    """CDC changelog compaction to the LATEST SNAPSHOT — the
    merge-on-read operator of lakehouse table formats (upsert rows and
    delete tombstones keyed by ``key_col``, ordered by
    ``(ts, seq)``): the surviving state per key is its last change,
    dropped entirely if that change is a tombstone. Reports per-attr
    live-row counts and exact integer cents sums.

    Topology: a per-batch COMPACTING partial first (lexsort by
    (key, ts, seq), keep each key's last row — a batch of B changes
    shrinks to <= distinct keys before anything shuffles; at 100 TB the
    changelog is heavily key-repetitive so this is the dominant
    reduction), then ONE hash shuffle on the key for the global argmax
    via map_groups, then a tiny groupby on attr. Only (key, t, seq,
    op, attr, cents) fixed-width cells ever ride the exchange —
    payloads would join back by key afterwards in a real apply.
    """
    from ray.data.aggregate import Count, Sum

    def compact(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False)
        t = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = b[seq_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, t, k))            # key asc, ts, seq
        ks = k[order]
        last = np.flatnonzero(
            np.concatenate([ks[1:] != ks[:-1], [True]]))
        take = order[last]
        return pa.table({
            key_col: pa.array(k[take]),
            "_t": pa.array(t[take]),
            seq_col: pa.array(s[take]),
            op_col: b[op_col].take(pa.array(take)),
            attr_col: b[attr_col].take(pa.array(take)),
            cents_col: b[cents_col].take(pa.array(take))})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        i = np.lexsort((g[seq_col].to_numpy(), g["_t"].to_numpy()))[-1]
        row = g.iloc[[i]]
        row = row[row[op_col] != delete_op]
        return row[[attr_col, cents_col]].reset_index(drop=True)

    live = (ds.map_batches(compact, batch_format="pyarrow")
            .groupby(key_col).map_groups(final, batch_format="pandas"))
    out = live.groupby(attr_col).aggregate(
        Count(alias_name="n_keys"),
        Sum(cents_col, alias_name="sum_cents"))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["n_keys"] = df["n_keys"].astype(np.int64)
        df["sum_cents"] = df["sum_cents"].astype(np.int64)
        return df

    return out.map_batches(fin, batch_format="pandas")


def ordered_collect(ds, key: str, order_col: str, tie_col: str,
                    payload_col: str, k: int = 5,
                    out_name: str = "collected"):
    """Distributed ORDERED COLLECT / string_agg: per key, the first
    ``k`` payloads by ``(order_col, tie_col)`` joined with commas —
    the "first five pages a user visited" shape. The collect itself is
    the easy part; the point is the TRUNCATING partial: each batch
    keeps only its local top-k rows per key (lexsort + group-head
    take, vectorized), so at most ``k x keys`` short rows reach the
    shuffle no matter how many events a hot key has — an unbounded
    ``collect_list`` is the classic OOM; this one is bounded by
    construction.

    Returns (key, n_collected, collected). Deterministic for a total
    (order, tie) order; value-hash oracle via SQL
    ``string_agg(... ORDER BY ...)`` over a row_number window.
    """

    def partial(b: pa.Table) -> pa.Table:
        kv = b[key].to_numpy(zero_copy_only=False)
        o = b[order_col].to_numpy(zero_copy_only=False)
        t = b[tie_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, o, kv))
        ks = kv[order]
        starts = np.flatnonzero(
            np.concatenate([[True], ks[1:] != ks[:-1]]))
        # rank within key group; keep rank < k
        rank = np.arange(len(ks)) - np.repeat(
            starts, np.diff(np.append(starts, len(ks))))
        take = order[rank < k]
        return pa.table({
            key: b[key].take(pa.array(take)),
            order_col: b[order_col].take(pa.array(take)),
            tie_col: b[tie_col].take(pa.array(take)),
            payload_col: b[payload_col].take(pa.array(take))})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([order_col, tie_col]).head(k)
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "n_collected": np.array([len(g)], dtype=np.int64),
            out_name: [",".join(map(str, g[payload_col]))]})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key).map_groups(final, batch_format="pandas"))


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            name_col: str = "metric", value_col: str = "value"):
    """UNPIVOT / melt (wide -> long): each input row becomes
    len(value_cols) rows (id_cols, metric-name, value). Purely
    row-local — a map_batches with zero shuffle, so it composes freely
    at any scale; the SQL twin is the UNION ALL expansion."""

    def melt(b: pa.Table) -> pa.Table:
        n = len(b)
        k = len(value_cols)
        cols = {}
        for c in id_cols:
            cols[c] = pa.concat_arrays(
                [b[c].combine_chunks()] * k)
        names = np.repeat(np.array(value_cols, dtype=object), n)
        # interleave per-metric blocks: metric m's block holds all rows
        cols[name_col] = pa.array(names, type=pa.string())
        vals = np.concatenate(
            [b[c].to_numpy(zero_copy_only=False).astype(np.int64)
             for c in value_cols])
        cols[value_col] = pa.array(vals, type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(melt, batch_format="pyarrow")


def ratio_to_report(ds, key: str, value: str,
                    out_name: str = "share_ppm"):
    """RATIO_TO_REPORT analytic: each key's exact cents sum plus its
    floor-ppm share of the grand total — one groupby for the per-key
    sums, the KB-sized aggregate folded on the driver (grand total =
    Python-int sum, immune to float order)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        v = b[value].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({key: b[key].to_numpy(
            zero_copy_only=False), "s": cents, "n": 1})
        g = df.groupby(key, as_index=False, sort=False).sum()
        g["s"] = g["s"].astype(np.int64)
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(key)
           .aggregate(Sum("n", alias_name="n_rows"),
                      Sum("s", alias_name="sum_cents"))
           .to_pandas())
    total = sum(int(x) for x in agg["sum_cents"])
    agg["n_rows"] = agg["n_rows"].astype(np.int64)
    agg["sum_cents"] = agg["sum_cents"].astype(np.int64)
    agg[out_name] = np.array(
        [int(x) * 10**6 // total if total > 0 else 0
         for x in agg["sum_cents"]], dtype=np.int64)
    return agg.sort_values(key).reset_index(drop=True)
