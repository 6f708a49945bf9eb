"""Persisted Bloom index + incremental-dedup audit (pipelines/distinct)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from t_digest_ray.state.bloom import BloomFilter


def test_bloom_index_roundtrip_and_magic(tmp_path):
    from t_digest_ray.pipelines.distinct import (load_bloom_index,
                                                 save_bloom_index)

    bl = BloomFilter.from_capacity(1000, 0.01)
    bl.update_batch(np.array([f"doc-{i}" for i in range(500)],
                             dtype=object))
    path = str(tmp_path / "idx.bloom")
    save_bloom_index(bl, path)
    rt = load_bloom_index(path)
    assert np.array_equal(rt.words, bl.words)
    assert rt.k == bl.k and rt.m == bl.m

    bad = tmp_path / "bad.bloom"
    bad.write_bytes(b"garbage")
    with pytest.raises(ValueError, match="bad magic"):
        load_bloom_index(str(bad))


def test_incremental_dedup_counts_exact_and_gated(ray_session):
    import ray.data as rd

    from t_digest_ray.functions.hashing import hash64
    from t_digest_ray.pipelines.distinct import incremental_dedup_counts

    hist = np.array([f"seen-{i}" for i in range(2000)], dtype=object)
    bl = BloomFilter.from_capacity(len(hist), 0.01)
    bl.update_batch(hist)

    new = pd.DataFrame({
        "k": ["a"] * 1500 + ["b"] * 1500,
        "text": ([f"seen-{i}" for i in range(1000)]          # a: members
                 + [f"fresh-a-{i}" for i in range(500)]
                 + [f"fresh-b-{i}" for i in range(1500)])})  # b: none
    out = incremental_dedup_counts(
        rd.from_pandas(new).repartition(4), bl, hash64(hist),
        "text", "k").to_pandas().set_index("k").sort_index()
    assert out.loc["a", "n_docs"] == 1500
    assert out.loc["a", "n_members"] == 1000
    assert out.loc["b", "n_members"] == 0
    assert out["within_bound"].all()

    # regression: an index missing half the historical corpus produces
    # false negatives -> the gate must flip for the member-holding key
    half = BloomFilter.from_capacity(len(hist), 0.01)
    half.update_batch(hist[:1000:2])
    bad = incremental_dedup_counts(
        rd.from_pandas(new).repartition(4), half, hash64(hist),
        "text", "k").to_pandas().set_index("k")
    assert not bad.loc["a", "within_bound"]
