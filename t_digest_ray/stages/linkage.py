"""Sorted-neighborhood entity-resolution blocking (Hernández & Stolfo,
SIGMOD 1995): order all records by a blocking key, and candidate pairs
are records within ``window`` positions of each other in that global
order — the sort-based complement of the hash blocking used everywhere
else in this repo (exact dedup, LSH bands, bucketed joins). Sorting
puts NEAR keys (typos, truncations, reformattings) next to each other
where no hash bucket would collide them.

Distributed shape (global ROW_NUMBER semantics without a global sort):

  1. bucket every record by a fixed PREFIX of the sort key — prefix
     order is consistent with full-key order, so bucket boundaries cut
     the global ordering into contiguous runs;
  2. per-bucket groupby: sort the bucket and emit all in-bucket pairs
     with rank gap ≤ window (w vectorized shifted-slice passes, no
     Python pair loop);
  3. a second, boundary pass extracts each bucket's first/last
     ``window`` records — at most 2·window rows per bucket, an
     aggregate by construction — and folds them on the driver with
     exact global ranks (bucket-count prefix sums + in-bucket
     positions) to emit the cross-bucket pairs the per-bucket pass
     cannot see, including runs spanning several near-empty buckets.

Every pair therefore appears exactly once with its exact global rank
gap, bit-identical to a ``ROW_NUMBER() OVER (ORDER BY key, id)``
windowed self-join at any parallelism or layout.

Partitioning contract (documented, same as hash_join's): one bucket's
records must fit in a worker — tune ``prefix_len`` so key prefixes
split the data finely enough; a longer prefix means more, smaller
buckets and a boundary set that grows only linearly with bucket count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sorted_neighborhood_pairs(ds, sort_col: str, id_col: str,
                              payload_cols: list[str], window: int = 4,
                              prefix_len: int = 15):
    """Candidate pairs within ``window`` global sorted positions.

    Returns a Dataset with columns ``id_a``, ``id_b``, ``gap`` (1-based
    rank distance, ≤ window) plus each payload column twice
    (``<col>_a`` / ``<col>_b``), ordered a-before-b in the global
    (sort_col, id_col) order."""
    from ray.data.aggregate import Count

    pay = list(payload_cols)
    all_cols = [id_col, sort_col] + pay

    def add_bucket(b: pa.Table) -> pa.Table:
        keys = b[sort_col].to_numpy(zero_copy_only=False).astype(str)
        cols = {c: b[c] for c in all_cols}
        cols["bucket"] = pa.array(
            np.array([k[:prefix_len] for k in keys], dtype=object),
            type=pa.string())
        return pa.table(cols)

    bds = ds.map_batches(add_bucket, batch_format="pyarrow")

    # bucket census: sorted bucket list + global offsets (aggregate-
    # sized — one row per distinct prefix)
    census = (bds.groupby("bucket").aggregate(Count(alias_name="n"))
              .to_pandas().sort_values("bucket").reset_index(drop=True))
    sizes = census["n"].to_numpy(dtype=np.int64)
    offsets = dict(zip(census["bucket"],
                       np.concatenate(([0], np.cumsum(sizes)[:-1]))))

    def sort_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values([sort_col, id_col], kind="stable")
                .reset_index(drop=True))

    def pair_frame(ga: pd.DataFrame, gb: pd.DataFrame,
                   gap: np.ndarray) -> pd.DataFrame:
        out = {"id_a": ga[id_col].to_numpy(),
               "id_b": gb[id_col].to_numpy(),
               "gap": gap.astype(np.int64)}
        for c in pay:
            out[f"{c}_a"] = ga[c].to_numpy()
            out[f"{c}_b"] = gb[c].to_numpy()
        return pd.DataFrame(out)

    def empty_pairs() -> pd.DataFrame:
        cols = {"id_a": pd.Series([], dtype=object),
                "id_b": pd.Series([], dtype=object),
                "gap": pd.Series([], dtype=np.int64)}
        for c in pay:
            cols[f"{c}_a"] = pd.Series([], dtype=object)
            cols[f"{c}_b"] = pd.Series([], dtype=object)
        return pd.DataFrame(cols)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = sort_bucket(g)
        n = len(g)
        if n < 2:
            return empty_pairs()
        frames = [
            pair_frame(g.iloc[:-d].reset_index(drop=True),
                       g.iloc[d:].reset_index(drop=True),
                       np.full(n - d, d))
            for d in range(1, min(window, n - 1) + 1)]
        return pd.concat(frames, ignore_index=True)

    def bucket_edges(g: pd.DataFrame) -> pd.DataFrame:
        g = sort_bucket(g)
        n = len(g)
        m = min(window, n)
        bidx = np.unique(np.concatenate(
            [np.arange(m), np.arange(n - m, n)]))
        edge = g.iloc[bidx]
        out = {"_id": edge[id_col].to_numpy(),
               "_bucket": edge["bucket"].to_numpy(),
               "_pos": bidx.astype(np.int64)}
        for c in pay:
            out[c] = edge[c].to_numpy()
        return pd.DataFrame(out)

    in_bucket = bds.groupby("bucket").map_groups(bucket_pairs,
                                                 batch_format="pandas")

    edges = (bds.groupby("bucket").map_groups(bucket_edges,
                                              batch_format="pandas")
             .to_pandas())
    cross_rows = []
    if len(edges):
        edges["_rank"] = (edges["_bucket"].map(offsets).to_numpy()
                          + edges["_pos"].to_numpy())
        edges = edges.sort_values("_rank").reset_index(drop=True)
        ranks = edges["_rank"].to_numpy()
        buckets = edges["_bucket"].to_numpy()
        for i in range(len(edges)):
            for j in range(i + 1, len(edges)):
                gap = int(ranks[j] - ranks[i])
                if gap > window:
                    break
                if buckets[i] == buckets[j]:
                    continue  # already emitted by its own bucket
                row = {"id_a": edges["_id"].iloc[i],
                       "id_b": edges["_id"].iloc[j],
                       "gap": np.int64(gap)}
                for c in pay:
                    row[f"{c}_a"] = edges[c].iloc[i]
                    row[f"{c}_b"] = edges[c].iloc[j]
                cross_rows.append(row)
    if cross_rows:
        import ray.data as rd
        return in_bucket.union(rd.from_pandas(pd.DataFrame(cross_rows)))
    return in_bucket
