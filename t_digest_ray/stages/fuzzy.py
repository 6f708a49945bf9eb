"""Edit-distance fuzzy matching via deletion-neighborhood blocking.

SymSpell-style candidate generation for Levenshtein distance 1 (the
public symmetric-delete scheme): every string is expanded to itself
plus its one-character-deletion variants; two strings at edit distance
exactly 1 are guaranteed to share at least one variant (delete the
substituted character from both, or delete the inserted character from
the longer), so grouping by variant yields a complete candidate set.
Sharing a variant only proves distance <= 2, so every candidate pair is
re-verified with an exact O(n) distance-1 check before it is emitted.

Scale shape: the operator runs over the DISTINCT key vocabulary, not
over rows — per-batch (key -> count) combine first, so a hot headword
shared by millions of documents contributes ONE vocabulary row and can
never explode a candidate bucket quadratically. Variant buckets are
shuffled on an 8-byte splitmix64 hash of the variant string; bucket
sizes are bounded by the number of distinct vocabulary words within one
edit of each other, which is small for natural text. Pairs discovered
in several buckets (e.g. a substitution pair shares up to len(s)
variants) are deduplicated by a final (head_a, head_b) group-by.

Reference parity: the reference has no fuzzy matcher; this extends the
dedup family (stages/dedup.py MinHash/SimHash) with the exact-threshold
string variant a web-text curation pipeline needs for typo-level
near-duplicate vocabulary analysis.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from t_digest_ray.functions.hashing import hash64


def within_one_edit(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) == 1 test in O(len) without a DP table."""
    la, lb = len(a), len(b)
    if a == b or abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _deletion_variants(s: str) -> list[str]:
    return [s] + [s[:i] + s[i + 1:] for i in range(len(s))]


def fuzzy_vocab_pairs(vocab_ds, key_col: str, cnt_col: str):
    """All pairs of distinct vocabulary strings at Levenshtein distance
    exactly 1, with their corpus counts.

    ``vocab_ds`` is an already-aggregated (key, count) Dataset (one row
    per distinct string). Returns (head_a, head_b, cnt_a, cnt_b) with
    head_a < head_b, sorted output per group. The expand step is a
    per-string Python loop — inherent to variant generation and linear
    in vocabulary bytes, never in corpus rows.
    """
    def expand(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pylist()
        cnts = b[cnt_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_v, out_k, out_c = [], [], []
        for k, c in zip(keys, cnts):
            for v in _deletion_variants(k):
                out_v.append(v)
                out_k.append(k)
                out_c.append(c)
        vh = hash64(np.asarray(out_v, dtype=object))
        return pa.table({
            "vh": pa.array(vh.astype(np.uint64), type=pa.uint64()),
            "head": pa.array(out_k, type=pa.string()),
            "cnt": pa.array(out_c, type=pa.int64()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # Distinct heads sharing this variant; verify exact distance 1.
        heads = g.drop_duplicates("head").sort_values("head")
        hs = heads["head"].tolist()
        cs = heads["cnt"].to_numpy(dtype=np.int64)
        a_out, b_out, ca, cb = [], [], [], []
        for i in range(len(hs)):
            for j in range(i + 1, len(hs)):
                if within_one_edit(hs[i], hs[j]):
                    a_out.append(hs[i]); b_out.append(hs[j])
                    ca.append(cs[i]);    cb.append(cs[j])
        return pd.DataFrame({"head_a": a_out, "head_b": b_out,
                             "cnt_a": np.asarray(ca, dtype=np.int64),
                             "cnt_b": np.asarray(cb, dtype=np.int64)})

    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[:1]

    return (vocab_ds.map_batches(expand, batch_format="pyarrow")
            .groupby("vh")
            .map_groups(bucket_pairs, batch_format="pandas")
            .groupby(["head_a", "head_b"])
            .map_groups(dedup_pair, batch_format="pandas"))


def fuzzy_cluster_stats(vocab_ds, key_col: str, cnt_col: str):
    """Typo-cluster report: connected components of the Levenshtein-1
    vocabulary graph (edges = fuzzy_vocab_pairs), labelled by each
    component's lexicographically smallest member. Output per cluster:
    (label, n_heads, sum_docs) for every cluster with >= 2 members.

    Composition: pairs -> dense string-rank ids over the PAIRED heads
    (O(duplicate pairs) driver gather, the same contract as
    distinct_pair_ids in stages/dedup.py) -> distributed min-label
    propagation (pair_graph_min_labels) -> label fold. Rank ids are
    assigned in sorted head order, so the component's min id IS its
    lexicographically smallest head and the SQL recursive-CTE twin
    reproduces the labels exactly.
    """
    from .dedup import pair_graph_min_labels

    pairs = fuzzy_vocab_pairs(vocab_ds, key_col, cnt_col)
    pdf = pairs.to_pandas()          # O(duplicate pairs), small
    if len(pdf) == 0:
        return pd.DataFrame({"label": pd.Series([], dtype=str),
                             "n_heads": pd.Series([], dtype=np.int64),
                             "sum_docs": pd.Series([], dtype=np.int64)})
    heads = sorted(set(pdf["head_a"]) | set(pdf["head_b"]))
    idx = {h: i for i, h in enumerate(heads)}
    cnt = {}
    for _, r in pdf.iterrows():
        cnt[r["head_a"]] = int(r["cnt_a"])
        cnt[r["head_b"]] = int(r["cnt_b"])

    import ray.data as rd
    int_pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([idx[h] for h in pdf["head_a"]],
                         type=pa.int64()),
        "id_b": pa.array([idx[h] for h in pdf["head_b"]],
                         type=pa.int64()),
    }))
    labels = pair_graph_min_labels(int_pairs).to_pandas()
    labels["head"] = [heads[i] for i in labels["node"]]
    labels["label"] = [heads[i] for i in labels["label"]]
    labels["docs"] = [cnt[h] for h in labels["head"]]
    out = (labels.groupby("label", as_index=False)
           .agg(n_heads=("head", "size"), sum_docs=("docs", "sum")))
    out["n_heads"] = out["n_heads"].astype(np.int64)
    out["sum_docs"] = out["sum_docs"].astype(np.int64)
    return out.sort_values("label").reset_index(drop=True)
