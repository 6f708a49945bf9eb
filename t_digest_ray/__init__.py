"""t_digest_ray — a Ray-Data-native distributed sketch / approximate-aggregation library.

Mergeable sketches (t-digest, KLL, HyperLogLog, count-min, Bloom, histograms)
implemented as vectorized numpy kernels and wired into Ray Data as partial
aggregation `map_batches` stages plus `groupby().aggregate()` merge UDAFs.
"""

__version__ = "0.1.0"

# Note on allocators: in this container, first-touch page faults on fresh
# mmap'ed memory are very expensive (~16 s to fault a cold 120 MB array vs
# ~15 ms to refill a recycled one). We A/B-tested glibc mallopt tuning
# (M_MMAP_MAX=0 + max trim threshold) to force heap reuse: it wins in a
# single-process numpy loop but LOSES in the real multi-worker pipeline
# (brk-heap fragmentation forces continual heap growth: repeated flagship
# runs degraded 24->34->64 s tuned vs 39->28->19 s with glibc defaults,
# whose dynamic mmap threshold already adapts). So: default allocator, and
# pipelines are written to keep per-batch buffers modest so glibc's dynamic
# threshold can recycle them.
