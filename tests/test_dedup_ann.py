"""Dedup (MinHash-LSH, SimHash, n-gram Jaccard) and similarity search
(brute-force + LSH cosine, embedding near-dup): planted-duplicate recall,
exact-verify precision, parallelism invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from t_digest_ray.stages.dedup import (jaccard_exact, minhash_lsh_pairs,
                                       minhash_signature, shingle_hashes,
                                       simhash_pairs)


@pytest.fixture(scope="module")
def planted_docs(ray_session):
    """200 random token docs + 10 exact dups + 5 near-dups + 2 empties."""
    import ray

    rng = np.random.default_rng(11)
    vocab = [f"tok{i:03d}" for i in range(500)]
    texts = [" ".join(rng.choice(vocab, 60)) for _ in range(200)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    for j in range(10):
        rows.append({"doc_id": 1000 + j, "text": texts[j]})
    for j in range(5):
        toks = texts[50 + j].split()
        toks[3] = "zzz"
        rows.append({"doc_id": 2000 + j, "text": " ".join(toks)})
    rows.append({"doc_id": 3000, "text": ""})
    rows.append({"doc_id": 3001, "text": None})
    return ray.data.from_pandas(pd.DataFrame(rows)).repartition(4), rows


def test_minhash_recall_and_precision(planted_docs):
    ds, rows = planted_docs
    pairs = minhash_lsh_pairs(ds, "text", "doc_id", k=128, bands=32,
                              threshold=0.5).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert all((j, 1000 + j) in found for j in range(10)), "missed exact dup"
    assert sum((50 + j, 2000 + j) in found for j in range(5)) >= 4
    # empties never pair
    assert not any(3000 in p or 3001 in p for p in found)
    # signature estimate tracks exact jaccard on every returned pair
    txt = {r["doc_id"]: r["text"] or "" for r in rows}
    for _, p in pairs.iterrows():
        exact = jaccard_exact(shingle_hashes(txt[p.id_a]),
                              shingle_hashes(txt[p.id_b]))
        assert abs(exact - p.est_jaccard) < 0.25
        assert exact > 0.3  # no wildly-false candidates survive


def test_verify_pairs_sharded_equals_broadcast(planted_docs):
    """The sharded co-partitioned verify (forced via shard_budget=1) must
    return exactly the broadcast path's rows (VERDICT r02 item 1)."""
    from t_digest_ray.stages.dedup import verify_pairs_exact_jaccard

    ds, _ = planted_docs
    pairs = minhash_lsh_pairs(ds, "text", "doc_id", k=128, bands=32,
                              threshold=0.5)

    def norm(df):
        df = df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        return df[["id_a", "id_b", "est_jaccard", "exact_jaccard",
                   "within_tol"]]

    bc = norm(verify_pairs_exact_jaccard(pairs, ds, "text", "doc_id")
              .to_pandas())
    sh = norm(verify_pairs_exact_jaccard(pairs, ds, "text", "doc_id",
                                         shard_budget=1).to_pandas())
    assert len(bc) > 0
    pd.testing.assert_frame_equal(bc, sh, check_dtype=False)


def test_simhash_exact_dups(planted_docs):
    ds, _ = planted_docs
    pairs = simhash_pairs(ds, "text", "doc_id", max_hamming=3).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert all((j, 1000 + j) in found for j in range(10))
    zero = pairs[pairs["hamming"] == 0]
    assert len(zero) >= 10
    assert not any(3000 in p or 3001 in p for p in found)


def test_minhash_parallelism_invariant(planted_docs, ray_session):
    import ray

    _, rows = planted_docs
    df = pd.DataFrame(rows)
    out = []
    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts)
        p = minhash_lsh_pairs(ds, "text", "doc_id", k=64, bands=16,
                              threshold=0.5).to_pandas()
        out.append(set(zip(p["id_a"], p["id_b"])))
    assert out[0] == out[1]


def test_jaccard_exact_edges():
    a = np.array([1, 2, 3], dtype=np.uint64)
    b = np.array([2, 3, 4], dtype=np.uint64)
    assert jaccard_exact(a, a) == 1.0
    assert jaccard_exact(a, b) == pytest.approx(0.5)
    e = np.empty(0, dtype=np.uint64)
    assert jaccard_exact(e, e) == 1.0
    assert jaccard_exact(a, e) == 0.0


def test_minhash_signature_unbiased():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 2**63, 400).astype(np.uint64)
    b = np.concatenate([a[:200], rng.integers(0, 2**63, 200).astype(np.uint64)])
    a, b = np.unique(a), np.unique(b)
    sa, sb = minhash_signature(a, 256), minhash_signature(b, 256)
    est = (sa == sb).mean()
    true = jaccard_exact(a, b)
    assert abs(est - true) < 0.1


# ------------------------------------------------------------------- ANN


@pytest.fixture(scope="module")
def planted_vectors(ray_session):
    import ray

    rng = np.random.default_rng(13)
    base = rng.standard_normal((300, 32)).astype(np.float32)
    # 10 planted near-dup pairs: vec 500+j ~ vec j + tiny noise
    extra = base[:10] + rng.standard_normal((10, 32)).astype(np.float32) * 0.01
    vecs = np.concatenate([base, extra])
    ids = np.concatenate([np.arange(300), 500 + np.arange(10)])
    t = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                  "embedding": pa.array(list(vecs.astype(float)),
                                        type=pa.list_(pa.float32()))})
    return ray.data.from_arrow(t).repartition(4), vecs, ids


def test_embedding_near_dup_recall_precision(planted_vectors):
    from t_digest_ray.stages.ann import embedding_near_dup_pairs

    ds, vecs, ids = planted_vectors
    pairs = embedding_near_dup_pairs(ds, threshold=0.99, n_bands=8,
                                     n_planes=10).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert all((j, 500 + j) in found for j in range(10)), "missed planted dup"
    # precision: every returned pair really is >= threshold (exact check)
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    lookup = {int(i): norm[k] for k, i in enumerate(ids)}
    for _, p in pairs.iterrows():
        assert float(lookup[p.id_a] @ lookup[p.id_b]) >= 0.99 - 1e-5


def test_embedding_near_dup_sharded_equals_broadcast(planted_vectors):
    """Forced sharded cosine verify (shard_budget=1) returns exactly the
    broadcast path's pairs (VERDICT r02 item 1)."""
    from t_digest_ray.stages.ann import embedding_near_dup_pairs

    ds, _, _ = planted_vectors
    kwargs = dict(threshold=0.99, n_bands=8, n_planes=10)

    def norm(df):
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)[
            ["id_a", "id_b", "cosine"]]

    bc = norm(embedding_near_dup_pairs(ds, **kwargs).to_pandas())
    sh = norm(embedding_near_dup_pairs(ds, shard_budget=1,
                                       **kwargs).to_pandas())
    assert len(bc) >= 10
    pd.testing.assert_frame_equal(bc, sh, check_dtype=False)


def test_lsh_topk_recall_vs_brute_force(planted_vectors):
    from t_digest_ray.stages.ann import brute_force_topk, lsh_topk

    ds, vecs, ids = planted_vectors
    queries = vecs[:3]
    bf = brute_force_topk(ds, queries, k=5).to_pandas()
    ls = lsh_topk(ds, queries, k=5, n_planes=6).to_pandas()
    for qi in range(3):
        top_bf = set(bf[bf["query_id"] == qi]["vec_id"].head(5))
        top_ls = set(ls[ls["query_id"] == qi]["vec_id"].head(5))
        # multiprobe LSH keeps most of the exact top-5; the self-match and
        # its planted dup are always found
        assert len(top_bf & top_ls) >= 2


def test_minhash_dedup_keep_broadcast_vs_antijoin(planted_docs):
    """Both keep-set paths (plasma broadcast of distinct drop ids, and the
    exact hash-bucket anti-join forced by broadcast_limit=0) must survive
    the same rows, and every planted duplicate (larger id of a pair) must
    be gone (VERDICT r01 item 4: no driver-side pair set)."""
    from t_digest_ray.stages.dedup import minhash_dedup_keep, minhash_lsh_pairs

    ds, rows = planted_docs
    kwargs = dict(k=128, bands=32, threshold=0.5)
    pairs = minhash_lsh_pairs(ds, "text", "doc_id", **kwargs).to_pandas()
    expected_drop = set(pairs["id_b"])
    all_ids = {r["doc_id"] for r in rows}

    kept_bc = sorted(minhash_dedup_keep(ds, "text", "doc_id", **kwargs)
                     .to_pandas()["doc_id"])
    kept_aj = sorted(minhash_dedup_keep(ds, "text", "doc_id",
                                        broadcast_limit=0, **kwargs)
                     .to_pandas()["doc_id"])
    assert kept_bc == kept_aj
    assert set(kept_bc) == all_ids - expected_drop
    # exact dups: larger id dropped, smaller survives
    assert all(1000 + j not in set(kept_bc) for j in range(10))
    assert all(j in set(kept_bc) for j in range(10))


def test_pair_graph_min_labels_components(ray_session):
    """Distributed min-label propagation reaches the component minimum on
    chains and stars, with exact early stop."""
    import ray

    from t_digest_ray.stages.dedup import pair_graph_min_labels

    edges = [(1, 5), (3, 5),            # mid-node-heavy chain: min = 1
             (10, 11),                  # isolated pair
             (20, 21), (21, 22),        # id-ordered chain
             (30, 31), (32, 33), (31, 32)]  # 4-chain via two pairs
    pairs = ray.data.from_items(
        [{"id_a": a, "id_b": b} for a, b in edges]).repartition(3)
    got = pair_graph_min_labels(pairs, max_rounds=8).to_pandas()
    lab = dict(zip(got["node"], got["label"]))
    assert lab == {1: 1, 3: 1, 5: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20,
                   30: 30, 31: 30, 32: 30, 33: 30}


def test_minhash_dedup_closure_vs_one_round_chain(ray_session):
    """VERDICT r02 item 5: on a chain A~B~C (A<C<B by id, A !~ C) the
    legacy one-round rule keeps {A, C}; closure keeps only {A}."""
    import ray

    from t_digest_ray.stages.dedup import minhash_dedup_keep

    vocab = [f"w{i:03d}" for i in range(400)]
    S = " ".join(vocab[0:100])      # A-B shared block
    T = " ".join(vocab[100:200])    # B-C shared block
    rows = [
        {"doc_id": 1, "text": " ".join(vocab[200:220]) + " " + S},   # A
        {"doc_id": 3, "text": T + " " + " ".join(vocab[220:240])},   # C
        {"doc_id": 5, "text": S + " " + T},                          # B
    ]
    rng = np.random.default_rng(23)
    for i in range(20):  # unrelated padding docs
        rows.append({"doc_id": 100 + i,
                     "text": " ".join(rng.choice(vocab[240:], 60))})
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)
    kwargs = dict(k=128, bands=64, threshold=0.3)

    legacy = set(minhash_dedup_keep(ds, "text", "doc_id", closure_rounds=0,
                                    **kwargs).to_pandas()["doc_id"])
    closed = set(minhash_dedup_keep(ds, "text", "doc_id",
                                    **kwargs).to_pandas()["doc_id"])
    assert {1, 3} <= legacy and 5 not in legacy, legacy
    assert 1 in closed and 3 not in closed and 5 not in closed, closed
    # padding docs untouched either way
    assert all(100 + i in legacy and 100 + i in closed for i in range(20))


def test_coarse_bucket_count_scaling():
    """Bucket count grows with input so one map_groups group stays bounded
    (VERDICT r01 item 3: no fixed 256 at scale)."""
    from t_digest_ray.stages.partitioning import coarse_bucket_count

    assert coarse_bucket_count(n_rows=1000, rows_per_bucket=16384) == 256
    assert coarse_bucket_count(
        n_rows=100_000_000, rows_per_bucket=16384, fanout=32) == \
        -(-100_000_000 * 32 // 16384)
    # bounded above
    assert coarse_bucket_count(n_rows=10**13, rows_per_bucket=1) == 1 << 20
    # unknown input -> documented floor
    assert coarse_bucket_count(None) == 256


def test_coarse_bucket_count_from_source_metadata(ray_session):
    import ray.data as rd

    from t_digest_ray.stages.partitioning import coarse_bucket_count

    ds = rd.range(10_000_000)
    n = coarse_bucket_count(ds, rows_per_bucket=16384)
    assert n == -(-10_000_000 // 16384)
    # post-transform: metadata gone -> floor (callers pass n_rows at scale)
    assert coarse_bucket_count(ds.map_batches(lambda b: b)) == 256


# ------------------------------------------------------------ IVF index


def test_ivf_index_build_query_recall(planted_vectors, tmp_path):
    """Persisted IVF index: build once, query many; partition-pruned scan;
    recall vs brute force; deterministic rebuild."""
    import glob
    import json

    from t_digest_ray.stages.ann import brute_force_topk
    from t_digest_ray.stages.ann_index import build_ivf_index, ivf_topk

    ds, vecs, ids = planted_vectors
    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(ds, idx, n_lists=8, sample_size=512)
    assert meta["n_lists"] == 8
    assert len(glob.glob(f"{idx}/list=*/")) >= 4  # non-degenerate lists

    queries = vecs[:3]
    got = ivf_topk(idx, queries, k=5, n_probe=8).to_pandas()  # probe all
    bf = brute_force_topk(ds, queries, k=5).to_pandas()
    for qi in range(3):
        g = got[got.query_id == qi].sort_values("rank")["vec_id"].tolist()
        b = bf[bf.query_id == qi].sort_values("rank")["vec_id"].tolist()
        assert g == b, f"probe-all IVF must equal brute force (q{qi})"

    # pruned probe still finds each query's own vector at rank 1
    pruned = ivf_topk(idx, queries, k=5, n_probe=2).to_pandas()
    for qi in range(3):
        top1 = pruned[(pruned.query_id == qi)
                      & (pruned["rank"] == 1)]["vec_id"].iloc[0]
        assert top1 == ids[qi]

    # deterministic rebuild: identical centroids
    idx2 = str(tmp_path / "ivf2")
    build_ivf_index(ds, idx2, n_lists=8, sample_size=512)
    c1 = np.load(f"{idx}/centroids.npy")
    c2 = np.load(f"{idx2}/centroids.npy")
    assert np.array_equal(c1, c2)


def test_ivf_rebuild_replaces_index_atomically(planted_vectors, tmp_path):
    """Rebuilding into an existing index_dir must REPLACE it (ADVICE r02):
    no appended duplicate shards in list partitions, no orphan list dirs
    when rebuilding with fewer lists, and queries stay duplicate-free."""
    import glob

    from t_digest_ray.stages.ann_index import build_ivf_index, ivf_topk

    ds, vecs, ids = planted_vectors
    idx = str(tmp_path / "ivf_rebuild")
    build_ivf_index(ds, idx, n_lists=8, sample_size=512)
    files_before = sorted(glob.glob(f"{idx}/list=*/*.parquet"))

    # rebuild in place with the same config: same shard count, and top-k
    # returns each vector once (duplicated rows would surface as dup ids)
    build_ivf_index(ds, idx, n_lists=8, sample_size=512)
    files_after = sorted(glob.glob(f"{idx}/list=*/*.parquet"))
    assert len(files_after) == len(files_before)
    got = ivf_topk(idx, vecs[:2], k=5, n_probe=8).to_pandas()
    for qi in range(2):
        sub = got[got.query_id == qi]["vec_id"]
        assert sub.is_unique and len(sub) == 5

    # rebuild with FEWER lists: orphan list dirs must be gone
    build_ivf_index(ds, idx, n_lists=4, sample_size=512)
    lists = {p.split("list=")[1].rstrip("/")
             for p in glob.glob(f"{idx}/list=*/")}
    assert lists <= {"0", "1", "2", "3"}
    # no staging/old dirs left behind
    assert not glob.glob(f"{idx}.build-*") and not glob.glob(f"{idx}.old-*")


def test_ngram_jaccard_integer_pair_scores(ray_session):
    """Exact integer |inter|/|union| of word-3-gram sets through the
    sharded pair-verify path, vs a direct python reference — including a
    pair that must land BELOW the 0.5 dup threshold."""
    import ray

    from t_digest_ray.stages.dedup import (jaccard_exact, sharded_pair_verify,
                                           shingle_hashes)

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy dog tonight",
        3: "a completely different document about sketch engines",
    }
    pairs = ray.data.from_items([{"id_a": 1, "id_b": 2},
                                 {"id_a": 1, "id_b": 3}])
    payloads = ray.data.from_items(
        [{"id": i, "payload": shingle_hashes(t).astype("<u8").tobytes()}
         for i, t in texts.items()])

    def pair_fn(pdf, lut):
        a = pdf["id_a"].to_numpy(dtype=np.int64)
        b = pdf["id_b"].to_numpy(dtype=np.int64)
        inter = np.empty(len(a), dtype=np.int64)
        uni = np.empty(len(a), dtype=np.int64)
        for j, (x, y) in enumerate(zip(a, b)):
            sa = np.frombuffer(lut[x], dtype=np.uint64)
            sb = np.frombuffer(lut[y], dtype=np.uint64)
            ni = np.intersect1d(sa, sb, assume_unique=True).size
            inter[j], uni[j] = ni, sa.size + sb.size - ni
        return pd.DataFrame({"id_a": a, "id_b": b, "n_inter": inter,
                             "n_union": uni, "is_dup": 2 * inter >= uni})

    out = sharded_pair_verify(pairs, payloads, pair_fn, {}, 2, 2) \
        .to_pandas().set_index("id_b")
    sh = {i: shingle_hashes(t) for i, t in texts.items()}
    for other in (2, 3):
        want = jaccard_exact(sh[1], sh[other])
        row = out.loc[other]
        assert row["n_inter"] / row["n_union"] == pytest.approx(want)
    assert bool(out.loc[2, "is_dup"]) and not bool(out.loc[3, "is_dup"])


def test_minhash_planted_pairs_matches_oracle(ray_session):
    """Every planted exact-duplicate pair surfaces with est_jaccard == 1
    (identical signature collides in every band); matches the SQL set."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e.queries()["minhash_planted_dup_pairs"](sf).to_pandas() \
        .sort_values("id_a").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(e.oracle_sql()["minhash_planted_dup_pairs"]).df() \
        .sort_values("id_a").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
