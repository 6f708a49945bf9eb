"""DDSketch — relative-error quantile sketch (Masson, Rim & Lee,
VLDB 2019, "DDSketch: a fast and fully-mergeable quantile sketch with
relative-error guarantees").

Complements the library's rank-error quantile sketches (t-digest / KLL /
REQ, reference semantics per MergingDigest.java / KllDoublesSketch.java):
DDSketch guarantees VALUE-relative error — every quantile estimate x̂
satisfies ``|x̂ - x| <= alpha * |x|`` for the true order statistic x —
which is the right contract for long-tailed positive metrics (latencies,
payload sizes) where a p99 of 10 s and a p50 of 10 ms both need ~1%
accuracy *of their own magnitude*.

Design (paper §2-3), vectorized for Arrow batches:

* gamma = (1 + alpha) / (1 - alpha); value x > 0 lands in bucket
  ``i = ceil(log_gamma(x))`` (so gamma^(i-1) < x <= gamma^i); the bucket
  estimate ``2 * gamma^i / (gamma + 1)`` is within alpha of every value
  in the bucket.
* Three stores: positive buckets, negative buckets (indexes over |x|),
  and an exact zero/near-zero counter for ``|x| <= z_min``.
* Merge = bucket-wise count addition — exact, associative, commutative
  (paper §2.4: DDSketch is *fully* mergeable; the merged sketch is
  byte-identical to the sketch of the concatenated stream as long as no
  collapse has triggered).
* Bounded memory via the paper's collapse rule: when a store exceeds
  ``max_bins``, the lowest buckets fold into the lowest kept bucket.
  Folding is "index := max(index, boundary)" with a monotonically
  growing boundary, so re-collapse after merge composes associatively;
  collapsed (lowest-magnitude) buckets lose the alpha guarantee, all
  others keep it (paper Theorem 3).

Counts are float64 so weighted updates ride the same path as the other
sketches (protocol.py contract).
"""

from __future__ import annotations

import struct

import numpy as np

# alpha, max_bins, zero_count, n_neg, n_pos — a plain format string (a
# struct.Struct instance would break cloudpickle's serialize-by-value of
# this locally-defined module when the class ships inside a Ray task)
_HDR_FMT = "<dIdqq"
_HDR_SIZE = struct.calcsize(_HDR_FMT)


class DDSketch:
    """Relative-error quantile sketch over doubles."""

    __slots__ = ("alpha", "max_bins", "gamma", "_log_gamma", "z_min",
                 "zero_count", "pos", "neg")

    def __init__(self, alpha: float = 0.01, max_bins: int = 2048,
                 z_min: float = 1e-9):
        if not 0.0 < alpha < 1.0:
            raise ValueError(f"alpha must be in (0, 1), got {alpha}")
        self.alpha = float(alpha)
        self.max_bins = int(max_bins)
        self.gamma = (1.0 + alpha) / (1.0 - alpha)
        self._log_gamma = np.log(self.gamma)
        self.z_min = float(z_min)
        self.zero_count = 0.0
        self.pos: dict[int, float] = {}
        self.neg: dict[int, float] = {}

    # ------------------------------------------------------------ updates

    def _keys(self, mag: np.ndarray) -> np.ndarray:
        # ceil(log_gamma(x)); round-trip noise guarded the paper's way
        # (a value exactly on a boundary may land one bucket up — still
        # within the alpha bound).
        return np.ceil(np.log(mag) / self._log_gamma
                       - 1e-12).astype(np.int64)

    def _add_to(self, store: dict[int, float], keys: np.ndarray,
                w: np.ndarray) -> None:
        uniq, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, w)
        for k, s in zip(uniq.tolist(), sums.tolist()):
            store[k] = store.get(k, 0.0) + s

    def update_batch(self, values, weights=None) -> None:
        v = np.asarray(values, dtype=np.float64)
        w = (np.ones(len(v)) if weights is None
             else np.asarray(weights, dtype=np.float64))
        zero = np.abs(v) <= self.z_min
        self.zero_count += float(w[zero].sum())
        p = v > self.z_min
        if p.any():
            self._add_to(self.pos, self._keys(v[p]), w[p])
        n = v < -self.z_min
        if n.any():
            self._add_to(self.neg, self._keys(-v[n]), w[n])
        self._collapse()

    def merge(self, *others: "DDSketch") -> "DDSketch":
        for o in others:
            if abs(o.alpha - self.alpha) > 1e-15:
                raise ValueError("cannot merge DDSketches of different "
                                 f"alpha ({self.alpha} vs {o.alpha})")
            self.zero_count += o.zero_count
            for k, c in o.pos.items():
                self.pos[k] = self.pos.get(k, 0.0) + c
            for k, c in o.neg.items():
                self.neg[k] = self.neg.get(k, 0.0) + c
        self._collapse()
        return self

    def _collapse(self) -> None:
        for store in (self.pos, self.neg):
            if len(store) <= self.max_bins:
                continue
            keys = sorted(store)
            boundary = keys[len(keys) - self.max_bins]
            folded = 0.0
            for k in keys:
                if k >= boundary:
                    break
                folded += store.pop(k)
            store[boundary] = store.get(boundary, 0.0) + folded

    # ------------------------------------------------------------ queries

    @property
    def n(self) -> float:
        return (self.zero_count + sum(self.pos.values())
                + sum(self.neg.values()))

    def _bucket_value(self, key: int, sign: float) -> float:
        return sign * 2.0 * self.gamma ** key / (self.gamma + 1.0)

    def quantile(self, q: float) -> float:
        """Value estimate at rank ``ceil(q*n) - 1`` (0-based — the
        quantile_disc convention shared by the library's exact twins)."""
        total = self.n
        if total <= 0:
            return float("nan")
        rank = max(int(np.ceil(q * total)) - 1, 0)
        cum = 0.0
        # negative store: most negative value first = highest |x| bucket
        for k in sorted(self.neg, reverse=True):
            cum += self.neg[k]
            if cum > rank:
                return self._bucket_value(k, -1.0)
        cum += self.zero_count
        if cum > rank:
            return 0.0
        for k in sorted(self.pos):
            cum += self.pos[k]
            if cum > rank:
                return self._bucket_value(k, 1.0)
        # numeric tail guard: highest bucket
        return self._bucket_value(max(self.pos), 1.0) if self.pos \
            else 0.0

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    # ------------------------------------------------------------- serde

    def to_bytes(self) -> bytes:
        def pack(store: dict[int, float]) -> bytes:
            keys = np.fromiter(sorted(store), dtype=np.int64,
                               count=len(store))
            cnts = np.array([store[int(k)] for k in keys],
                            dtype=np.float64)
            return keys.tobytes() + cnts.tobytes()

        return (struct.pack(_HDR_FMT, self.alpha, self.max_bins,
                            self.zero_count, len(self.neg), len(self.pos))
                + pack(self.neg) + pack(self.pos))

    @classmethod
    def from_bytes(cls, buf: bytes) -> "DDSketch":
        alpha, max_bins, zero, n_neg, n_pos = \
            struct.unpack_from(_HDR_FMT, buf, 0)
        out = cls(alpha, max_bins)
        out.zero_count = zero
        off = _HDR_SIZE

        def unpack(n: int, off: int) -> tuple[dict[int, float], int]:
            keys = np.frombuffer(buf, dtype=np.int64, count=n,
                                 offset=off)
            off += 8 * n
            cnts = np.frombuffer(buf, dtype=np.float64, count=n,
                                 offset=off)
            return dict(zip(keys.tolist(), cnts.tolist())), off + 8 * n

        out.neg, off = unpack(n_neg, off)
        out.pos, off = unpack(n_pos, off)
        return out
