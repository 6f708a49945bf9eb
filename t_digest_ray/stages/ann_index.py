"""Persisted IVF index for repeated similarity search (VERDICT r01 gap 5).

``lsh_topk`` recomputes corpus signatures per query set; a real workload
builds an index ONCE and queries it many times. This module persists an
IVF (inverted-file) index as partitioned Parquet:

    {index_dir}/meta.json                 n_lists, dim, row counts
    {index_dir}/centroids.npy             (n_lists, dim) float32, L2-normed
    {index_dir}/list={i}/part-*.parquet   (vec_id, embedding) of list i

Build: spherical k-means centroids trained driver-side on a deterministic
sample (hash-selected with a keep-rate derived from the corpus row count,
so the driver gather is ~2x ``sample_size`` rows regardless of corpus
size, and the kept subset is hash-uniform — not an id-ordered prefix),
then ONE ``map_batches`` pass assigns every vector to its nearest
centroid and the rows are written partitioned by list id.

Rebuild atomicity (ADVICE r02): the whole index is built into a fresh
``{index_dir}.build-*`` staging dir and swapped in with directory
renames at the end — a rebuild never appends shards into live ``list=*/``
partitions (Ray's write_parquet adds uuid-named files and removes
nothing, so in-place rebuilds would duplicate vectors and leave orphan
lists). A killed build leaves the old index untouched plus an ignorable
staging dir. At 100 TB each list partition is a directory of parquet
shards and the build is a single scan + partitioned write.

Query: load centroids (KBs), pick the ``n_probe`` nearest lists per
query, and ``read_parquet`` ONLY those list directories — IO pruning at
the partition level, the IVF analogue of parquet row-group pruning. The
scan cost is ``n_probe/n_lists`` of the corpus instead of 1.0.

Determinism: ties in assignment/top-k break by (score desc, vec_id asc);
k-means init and iteration order are fixed, so the same corpus always
yields the same index bytes and the same query answers.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .ann import _embeddings_matrix, _normalize


def _train_centroids(sample: np.ndarray, n_lists: int,
                     n_iter: int = 10) -> np.ndarray:
    """Deterministic spherical k-means on a (s, d) normalized sample."""
    n = len(sample)
    if n < n_lists:
        raise ValueError(f"sample ({n}) smaller than n_lists ({n_lists})")
    cent = sample[:n_lists].copy()  # sample arrives in hash order (random-ish)
    for _ in range(n_iter):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(n_lists):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def build_ivf_index(ds, index_dir: str, n_lists: int = 16,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    sample_size: int = 8192, seed: int = 42,
                    n_rows: int | None = None) -> dict:
    """Build and persist the IVF index; returns the meta dict.

    The training sample is hash-selected: rows whose ``splitmix64(id)``
    falls under a threshold sized so the EXPECTED kept count is
    ``~2 * sample_size`` (keep-rate = ``2*sample_size / n_rows``), then
    the lowest ``sample_size`` rows BY HASH are used — a deterministic,
    parallelism-independent, hash-uniform subset whose driver gather is
    O(sample_size) no matter the corpus size. ``n_rows`` defaults to the
    source metadata count (parquet exposes it without executing); pass it
    explicitly for post-transform inputs to avoid a counting pass."""
    import shutil

    import ray
    import ray.data as rd

    from ..functions.hashing import splitmix64
    from .partitioning import cheap_row_count

    if n_rows is None:
        n_rows = cheap_row_count(ds)
    if n_rows is None:
        # correct fallback (one counting pass); at scale pass n_rows
        n_rows = ds.count()
    # threshold so that E[kept] ~= 2*sample_size, clamped to keep-all
    rate = min(1.0, max(2 * sample_size, n_lists * 4) / max(n_rows, 1))
    threshold = np.uint64(min(int(rate * 2.0 ** 64), 2 ** 64 - 1))

    def sample_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
        keep = h < threshold if rate < 1.0 else np.ones(len(ids), bool)
        if not keep.any():
            return pa.table({"h": pa.array([], pa.uint64()),
                             "vec": pa.array([], pa.binary())})
        v = _normalize(_embeddings_matrix(batch[vec_col]))[keep]
        return pa.table({
            "h": pa.array(h[keep]),
            "vec": pa.array([r.astype("<f4").tobytes() for r in v],
                            type=pa.binary())})

    sample_pd = (ds.map_batches(sample_batch, batch_format="pyarrow")
                 .to_pandas().sort_values("h").head(sample_size))
    sample = np.stack([np.frombuffer(b, dtype=np.float32)
                       for b in sample_pd["vec"]])
    cent = _train_centroids(sample, n_lists)

    # stage the whole index, swap in atomically at the end
    build_dir = f"{index_dir.rstrip('/')}.build-{os.getpid()}"
    shutil.rmtree(build_dir, ignore_errors=True)
    os.makedirs(build_dir)
    np.save(os.path.join(build_dir, "centroids.npy"), cent)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        v = _normalize(_embeddings_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             vec_col: batch[vec_col],
                             "list": pa.array([], pa.int32())})
        scores = v @ c.T
        lst = np.argmax(scores, axis=1).astype(np.int32)
        return pa.table({id_col: pa.array(ids),
                         vec_col: batch[vec_col],
                         "list": pa.array(lst)})

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    assigned.write_parquet(build_dir, partition_cols=["list"])
    meta = {"n_lists": int(n_lists), "dim": int(cent.shape[1]),
            "id_col": id_col, "vec_col": vec_col, "seed": int(seed)}
    with open(os.path.join(build_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    # swap: old index (if any) moves aside, staging dir takes its place.
    # A rebuild therefore replaces — never appends into — list partitions,
    # and a crash anywhere above leaves the previous index live.
    old_dir = f"{index_dir.rstrip('/')}.old-{os.getpid()}"
    shutil.rmtree(old_dir, ignore_errors=True)
    if os.path.isdir(index_dir):
        os.rename(index_dir, old_dir)
    os.rename(build_dir, index_dir)
    shutil.rmtree(old_dir, ignore_errors=True)
    return meta


def ivf_topk(index_dir: str, queries: np.ndarray, k: int = 10,
             n_probe: int = 4):
    """Cosine top-k per query over the persisted index, scanning only the
    ``n_probe`` nearest list partitions per query (union across queries).

    Returns a Dataset (query_id, vec_id, score, rank), ranked like
    ``brute_force_topk`` (score desc, vec_id asc, rounded to 6 dp)."""
    import glob

    import ray
    import ray.data as rd

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    qm = _normalize(np.asarray(queries, dtype=np.float32))
    sims = qm @ cent.T  # (q, n_lists)
    probe_lists = np.unique(
        np.argsort(-sims, axis=1, kind="stable")[:, :n_probe])
    paths = []
    for lst in probe_lists:
        paths.extend(sorted(glob.glob(
            os.path.join(index_dir, f"list={lst}", "*.parquet"))))
    if not paths:
        raise FileNotFoundError(f"no list partitions under {index_dir}")
    ds = rd.read_parquet(paths, columns=[id_col, vec_col])

    q_ref = ray.put(qm)

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        v = _normalize(_embeddings_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int32()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        scores = v @ q.T
        take = min(k, len(ids))
        out_q, out_i, out_s = [], [], []
        for qi in range(q.shape[0]):
            s = scores[:, qi]
            top = np.argpartition(-s, take - 1)[:take]
            out_q.append(np.full(take, qi, dtype=np.int32))
            out_i.append(ids[top])
            out_s.append(s[top].astype(np.float64))
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_i)),
                         "score": pa.array(np.concatenate(out_s))})

    candidates = ds.map_batches(score, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score"] = g["score"].round(6)
        g = g.sort_values(["score", id_col],
                          ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return candidates.groupby("query_id").map_groups(
        final_topk, batch_format="pandas")
