"""Approximate distinct counting (HLL) and membership (Bloom) pipelines."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.bloom import BloomFilter
from ..state.hll import HyperLogLog
from ..state.protocol import SketchSpec
from ..stages.aggregate import sketch_by_key, summarize


def hll_spec(p: int = 14) -> SketchSpec:
    return SketchSpec(
        name="hll",
        factory=lambda: HyperLogLog(p),
        from_bytes=HyperLogLog.from_bytes,
        summarize=lambda sk: {"distinct_estimate": float(sk.estimate())},
    )


def distinct_by_key(ds, value_col: str, key: str | None = None, p: int = 14,
                    num_salts: int = 8, batch_size: int | None = None,
                    key_name: str | None = None):
    """Approximate count(distinct value_col) per key via HLL register-max
    merges (global single row when key is None)."""
    spec = hll_spec(p)
    merged = sketch_by_key(ds, spec, value_col, key,
                           num_salts=num_salts, batch_size=batch_size)
    return summarize(merged, spec, key_name=key_name or (key or "key"))


def bloom_spec(n_bits: int = 1 << 20, k: int = 7) -> SketchSpec:
    return SketchSpec(
        name="bloom",
        factory=lambda: BloomFilter(n_bits, k),
        from_bytes=BloomFilter.from_bytes,
        summarize=lambda sk: {"n_added": sk.n_added,
                              "fill_ratio": sk.fill_ratio()},
    )


def build_bloom(ds, value_col: str, n_bits: int = 1 << 20, k: int = 7,
                batch_size: int | None = None) -> BloomFilter:
    """Build one Bloom filter over a column via the partial/merge topology
    and return the materialized filter (small: m/8 bytes)."""
    spec = bloom_spec(n_bits, k)
    merged = sketch_by_key(ds, spec, value_col, None,
                           num_salts=4, batch_size=batch_size)
    row = merged.take(1)[0]
    return BloomFilter.from_bytes(row["sketch"])


def bloom_semi_join(probe_ds, bloom: BloomFilter, probe_col: str,
                    exact_keys=None):
    """Filter probe rows whose ``probe_col`` is (probably) in the filter.

    The Bloom prefilter is broadcast once via ray.put and drops non-members
    with zero false negatives; pass ``exact_keys`` (a set, also broadcast) to
    verify survivors and make the semi-join exact — the standard
    filter-then-verify pattern for distributed semi joins.
    """
    import ray

    bloom_ref = ray.put(bloom.to_bytes())
    keys_ref = ray.put(None if exact_keys is None
                       else np.asarray(sorted(exact_keys)))

    class Probe:
        def __init__(self):
            self.bloom = BloomFilter.from_bytes(ray.get(bloom_ref))
            self.keys = ray.get(keys_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = batch[probe_col].to_numpy(zero_copy_only=False)
            mask = self.bloom.contains(vals)
            if self.keys is not None and mask.any():
                idx = np.searchsorted(self.keys, vals[mask])
                idx = np.clip(idx, 0, len(self.keys) - 1)
                exact = self.keys[idx] == vals[mask]
                m = mask.copy()
                m[np.flatnonzero(mask)[~exact]] = False
                mask = m
            return batch.filter(pa.array(mask))

    return probe_ds.map_batches(Probe, batch_format="pyarrow",
                                concurrency=(1, 8))
