"""Distribution comparison between sketches (reference Comparison.java).

* ``llr(counts)``        — G-test / log-likelihood-ratio score, 2N·MI of the
                           2xK count table (Comparison.java:115-162).
* ``compare_chi2``       — two t-digests compared on quantile-cut buckets of
                           the first (Comparison.java:49-75).
* ``compare_chi2_hist``  — two same-shape histograms (Comparison.java:90-112).
* ``ks``                 — Kolmogorov-Smirnov statistic over the union grid
                           of centroid locations, scaled by
                           sqrt(n1*n2/(n1+n2)) (Comparison.java:173-217).

These are driver-side analytics over merged sketch rows: the distributed
part (building the per-group digests) is the groupby-aggregate pipeline;
comparing two KB-sized digests is O(centroids).
"""

from __future__ import annotations

import numpy as np

from .tdigest import TDigest


def llr(counts) -> float:
    """G-test score of a RxK contingency table: 2N * mutual information.

    Asymptotically chi^2 under "same distribution"; used as a
    bigger-means-more-different score, not a calibrated test.
    """
    k = np.asarray(counts, dtype=np.float64)
    if k.size == 0:
        raise ValueError("llr needs a non-empty count table")
    if (k < 0).any():
        raise ValueError("negative count in llr")
    total = k.sum()
    if total == 0:
        return 0.0

    def ent(v: np.ndarray) -> float:
        v = v[v > 0]
        return float((v * np.log(v)).sum())

    norm = total * np.log(total)
    h = ent(k.ravel()) - norm
    hr = ent(k.sum(axis=1)) - norm
    hc = ent(k.sum(axis=0)) - norm
    return 2.0 * (h - hr - hc)


def compare_chi2(d1: TDigest, d2: TDigest,
                 q_cuts=(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
                 ) -> float:
    """G-test over quantile-bucket counts: buckets are d1's quantile cuts;
    d2's counts come from its cdf at those cut values."""
    q_cuts = np.asarray(q_cuts, dtype=np.float64)
    n_bins = len(q_cuts) + 1
    counts = np.zeros((2, n_bins))
    old_q, old_q2 = 0.0, 0.0
    for i in range(n_bins):
        if i == len(q_cuts):
            new_q = 1.0
            x = max(d1.max, d2.max) + 1.0
        else:
            new_q = q_cuts[i]
            x = d1.quantile(new_q)
        counts[0, i] = d1.size * (new_q - old_q)
        q2 = d2.cdf(x)
        counts[1, i] = d2.size * (q2 - old_q2)
        old_q, old_q2 = new_q, q2
    return llr(counts)


def compare_chi2_hist(counts1, counts2) -> float:
    """G-test of two histograms with identical binning (vector counts)."""
    c1 = np.asarray(counts1, dtype=np.float64)
    c2 = np.asarray(counts2, dtype=np.float64)
    if c1.shape != c2.shape:
        raise ValueError("histograms must have identical binning")
    return llr(np.stack([c1, c2]))


def ks(d1: TDigest, d2: TDigest) -> float:
    """Scaled KS statistic: max |cdf1 - cdf2| over the union of both
    digests' centroid means and extremes, times sqrt(n1*n2/(n1+n2))."""
    if d1.size == 0 or d2.size == 0:
        return 0.0
    grid = np.unique(np.concatenate([
        d1.centroids()[0], d2.centroids()[0],
        [d1.min, d1.max, d2.min, d2.max]]))
    diff = np.abs(d1.cdf_batch(grid) - d2.cdf_batch(grid)).max()
    n1, n2 = d1.size, d2.size
    return float(diff * np.sqrt(n1 * n2 / (n1 + n2)))
