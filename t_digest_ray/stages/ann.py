"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — the exact baseline: the (small) query matrix is
  broadcast once via ``ray.put``; every batch computes one numpy matmul
  against it and emits only its local top-k per query, so the global
  reduce sees ``#batches * k`` candidate rows per query, never the corpus.
* ``lsh_topk`` — the scale path: random-hyperplane LSH (Charikar 2002)
  assigns every vector to a signature bucket; queries probe their own
  bucket plus all Hamming-1 neighbours, so only a vanishing fraction of the
  corpus is scored at 10^12 rows. Recall is tunable via ``n_planes`` /
  multiprobe radius; exactness is NOT guaranteed (documented trade-off).

Ties are broken deterministically by (score desc, vec_id asc) so results
are stable across parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _embeddings_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Zero-copy-ish (values buffer) list<float> -> (n, d) float32 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = col.values.to_numpy(zero_copy_only=False)
    offsets = col.offsets.to_numpy()
    widths = np.diff(offsets)
    if len(widths) == 0:
        return np.empty((0, 0), dtype=np.float32)
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("ragged embedding column")
    start = offsets[0]
    return values[start:start + len(widths) * d].reshape(-1, d) \
        .astype(np.float32, copy=False)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     batch_size: int = 4096):
    """Exact cosine top-k for each query row of ``queries`` (q, d).

    Returns a Dataset (query_id, vec_id, score) with k rows per query,
    score = cosine similarity rounded to 6 decimals for stability.
    """
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(qm)

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)  # fetched once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = _normalize(_embeddings_matrix(batch[vec_col]))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                return pa.table({"query_id": pa.array([], pa.int32()),
                                 id_col: pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            scores = v @ self.q.T  # (n, q)
            take = min(k, len(ids))
            out_q, out_i, out_s = [], [], []
            for qi in range(self.q.shape[0]):
                s = scores[:, qi]
                top = np.argpartition(-s, take - 1)[:take]
                out_q.append(np.full(take, qi, dtype=np.int32))
                out_i.append(ids[top])
                out_s.append(s[top].astype(np.float64))
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_i)),
                "score": pa.array(np.concatenate(out_s)),
            })

    candidates = ds.map_batches(Score, batch_format="pyarrow",
                                batch_size=batch_size, concurrency=(1, 8))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score"] = g["score"].round(6)
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return candidates.groupby("query_id").map_groups(
        final_topk, batch_format="pandas")


def embedding_near_dup_pairs(ds, threshold: float = 0.9, n_bands: int = 4,
                             n_planes: int = 12, vec_col: str = "embedding",
                             id_col: str = "vec_id", seed: int = 42,
                             batch_size: int = 4096):
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    Scale path: ``n_bands`` independent random-hyperplane signatures
    (Charikar 2002); vectors sharing any band signature land in one bucket,
    and only buckets are searched all-pairs with exact cosine verification —
    the embedding analogue of MinHash-LSH banding. Two vectors at cosine c
    collide in one band w.p. (1 - acos(c)/pi)^n_planes; n_bands bands boost
    recall to 1-(1-p)^b. False candidates are removed by the exact check.

    Grouping uses the same coarse-bucket trick as stages.dedup: one Python
    group call per (hash % 256), true buckets found as sorted runs inside.
    """
    import ray

    rng = np.random.default_rng(seed)
    # planes for all bands at once; dim discovered on first batch
    state = ray.put(rng.standard_normal((n_bands * n_planes, 4096))
                    .astype(np.float32))

    coarse_buckets = 256

    def signatures(batch: pa.Table) -> pa.Table:
        v = _normalize(_embeddings_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n, d = v.shape if v.ndim == 2 else (0, 0)
        if n == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "band": pa.array([], pa.int32()),
                             "sig": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "vec": pa.array([], pa.binary())})
        planes = ray.get(state)[:, :d]
        out_b, out_s, out_i, out_v = [], [], [], []
        blobs = [row.astype("<f4").tobytes() for row in v]
        for b in range(n_bands):
            p = planes[b * n_planes:(b + 1) * n_planes]
            sig = _plane_signatures(v, p)
            out_b.append(np.full(n, b, dtype=np.int32))
            out_s.append(sig)
            out_i.append(ids)
            out_v.extend(blobs)
        from ..functions.hashing import splitmix64
        band = np.concatenate(out_b)
        sig = np.concatenate(out_s)
        with np.errstate(over="ignore"):
            h = splitmix64(sig.astype(np.uint64)
                           ^ (band.astype(np.uint64) << np.uint64(56)))
        return pa.table({
            "bucket": pa.array((h % np.uint64(coarse_buckets))
                               .astype(np.int32)),
            "band": pa.array(band),
            "sig": pa.array(sig),
            id_col: pa.array(np.concatenate(out_i)),
            "vec": pa.array(out_v, type=pa.binary()),
        })

    exploded = ds.map_batches(signatures, batch_format="pyarrow",
                              batch_size=batch_size)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = g.sort_values(["band", "sig", id_col], kind="stable")
        key = (g["band"].to_numpy().astype(np.int64) << 56) \
            ^ g["sig"].to_numpy().astype(np.int64)
        ids = g[id_col].to_numpy()
        vecs = np.stack([np.frombuffer(b, dtype=np.float32)
                         for b in g["vec"]])
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        bounds = np.append(starts, len(key))
        rows = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            block = vecs[s:e]
            sims = block @ block.T
            ii, jj = np.triu_indices(e - s, k=1)
            hit = sims[ii, jj] >= threshold
            for i, j, c in zip(ii[hit], jj[hit], sims[ii, jj][hit]):
                a, b = int(ids[s + i]), int(ids[s + j])
                if a != b:
                    rows.append((min(a, b), max(a, b), float(c)))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])

    pairs = exploded.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pandas")
    from ray.data.aggregate import Max
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("cosine", alias_name="cosine"))


def _plane_signatures(v: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (v @ planes.T) > 0  # (n, p)
    out = np.zeros(len(v), dtype=np.int64)
    for i in range(planes.shape[0]):
        out |= bits[:, i].astype(np.int64) << i
    return out


def lsh_topk(ds, queries: np.ndarray, k: int = 10, n_planes: int = 8,
             vec_col: str = "embedding", id_col: str = "vec_id",
             seed: int = 42, batch_size: int = 4096):
    """Approximate cosine top-k: score only vectors whose hyperplane
    signature is within Hamming distance 1 of the query's signature."""
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float32))
    d = qm.shape[1]
    planes = np.random.default_rng(seed).normal(size=(n_planes, d)) \
        .astype(np.float32)
    qsig = _plane_signatures(qm, planes)
    # multiprobe: own bucket + all hamming-1 buckets per query
    probes = {int(s) for s in qsig}
    for s in qsig:
        for b in range(n_planes):
            probes.add(int(s) ^ (1 << b))
    q_ref = ray.put((qm, planes, qsig, np.asarray(sorted(probes))))

    class Score:
        def __init__(self):
            self.q, self.planes, self.qsig, self.probes = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = _normalize(_embeddings_matrix(batch[vec_col]))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            empty = pa.table({"query_id": pa.array([], pa.int32()),
                              id_col: pa.array([], pa.int64()),
                              "score": pa.array([], pa.float64())})
            if len(ids) == 0:
                return empty
            sig = _plane_signatures(v, self.planes)
            mask = np.isin(sig, self.probes)
            if not mask.any():
                return empty
            v, ids, sig = v[mask], ids[mask], sig[mask]
            scores = v @ self.q.T
            take = min(k, len(ids))
            out_q, out_i, out_s = [], [], []
            for qi in range(self.q.shape[0]):
                # only vectors within hamming-1 of this query's signature
                ham = np.zeros(len(sig), dtype=bool)
                s0 = self.qsig[qi]
                ham |= sig == s0
                for b in range(self.planes.shape[0]):
                    ham |= sig == (s0 ^ (1 << b))
                if not ham.any():
                    continue
                s = np.where(ham, scores[:, qi], -np.inf)
                t = min(take, int(ham.sum()))
                top = np.argpartition(-s, t - 1)[:t]
                top = top[np.isfinite(s[top])]
                out_q.append(np.full(len(top), qi, dtype=np.int32))
                out_i.append(ids[top])
                out_s.append(s[top].astype(np.float64))
            if not out_q:
                return empty
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_i)),
                "score": pa.array(np.concatenate(out_s)),
            })

    candidates = ds.map_batches(Score, batch_format="pyarrow",
                                batch_size=batch_size, concurrency=(1, 8))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score"] = g["score"].round(6)
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return candidates.groupby("query_id").map_groups(
        final_topk, batch_format="pandas")
