"""t_digest_ray — a Ray-Data-native distributed sketch / approximate-aggregation library.

Mergeable sketches (t-digest, KLL, HyperLogLog, count-min, Bloom, histograms)
implemented as vectorized numpy kernels and wired into Ray Data as partial
aggregation `map_batches` stages plus `groupby().aggregate()` merge UDAFs.
"""

__version__ = "0.1.0"
