"""KLL± — quantile sketch over a TURNSTILE stream (inserts + deletes).

Follows the paired-sketch construction of "KLL±: Approximate Quantile
Sketches over Dynamic Datasets" (VLDB 2021): maintain one KLL over
insertions and one over deletions; the net rank of x is
``r_add(x) - r_del(x)`` and quantile queries scan the union of both
sketches' retained items for the first candidate whose net rank reaches
``q * n_net``. Error is bounded relative to the ABSOLUTE stream length
(inserts + deletes), so the effective net-rank bound scales by
``n_abs / n_net`` — exposed via :meth:`net_rank_bound`.

Mergeable (pairwise KLL merges, associative/commutative like the base
sketch) and drop-in compatible with ``stages.aggregate.sketch_by_key``:
``update_batch(values, weights)`` interprets the optional weights column
as the op sign (+1 insert, -1 delete), so a turnstile stream is just a
Dataset with a ±1 ``op`` column.
"""

from __future__ import annotations

import struct

import numpy as np

from .kll import KllSketch


class KllPM:
    """Paired add/delete KLL over a turnstile stream."""

    __slots__ = ("adds", "dels", "k")

    def __init__(self, k: int = 200, seed: int = 42):
        self.k = k
        self.adds = KllSketch(k, seed)
        self.dels = KllSketch(k, seed)

    # ------------------------------------------------------------ updates

    def update_batch(self, values, weights=None) -> None:
        """weights is the op-sign column: +1 insert, -1 delete
        (None = all inserts)."""
        values = np.asarray(values, dtype=np.float64)
        if weights is None:
            self.adds.update_batch(values)
            return
        ops = np.asarray(weights)
        ins = values[ops > 0]
        del_ = values[ops < 0]
        if len(ins):
            self.adds.update_batch(ins)
        if len(del_):
            self.dels.update_batch(del_)

    def merge(self, *others: "KllPM") -> "KllPM":
        self.adds.merge(*[o.adds for o in others])
        self.dels.merge(*[o.dels for o in others])
        return self

    # ------------------------------------------------------------ queries

    @property
    def size(self) -> float:
        """NET item count (inserts - deletes); exact integer counters."""
        return float(self.adds.n - self.dels.n)

    @property
    def n_abs(self) -> int:
        """Absolute stream length (inserts + deletes)."""
        return int(self.adds.n + self.dels.n)

    def net_rank_bound(self) -> float:
        """Published-bound analogue for the net distribution: the base
        KLL rank error applies to each constituent sketch relative to
        its own stream, so the net-rank error is bounded by the sum of
        both absolute errors normalized by the net count."""
        nre = KllSketch.normalized_rank_error(self.k)
        n_net = max(self.adds.n - self.dels.n, 1)
        return nre * (self.adds.n + self.dels.n) / n_net

    def _net_cum(self):
        ita, wa = self.adds._weighted_sorted()
        itd, wd = self.dels._weighted_sorted()
        cand = np.unique(np.concatenate([ita, itd])) if len(itd) \
            else np.unique(ita)
        cuma = np.concatenate(([0.0], np.cumsum(wa)))
        cumd = np.concatenate(([0.0], np.cumsum(wd)))
        net = (cuma[np.searchsorted(ita, cand, side="right")]
               - cumd[np.searchsorted(itd, cand, side="right")])
        return cand, net

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q should be in [0,1], got {q}")
        n_net = self.adds.n - self.dels.n
        if n_net <= 0:
            return float("nan")
        cand, net = self._net_cum()
        if not len(cand):
            return float("nan")
        target = q * float(net[-1] if len(net) else 0.0)
        # net rank is not monotone under deletions: first crossing wins
        hit = np.nonzero(net >= target)[0]
        idx = int(hit[0]) if len(hit) else len(cand) - 1
        return float(cand[idx])

    def quantile_batch(self, qs) -> np.ndarray:
        return np.asarray([self.quantile(float(q))
                           for q in np.atleast_1d(qs)])

    def rank(self, x: float) -> float:
        """Net normalized rank of x (LT convention on both sides)."""
        n_net = self.adds.n - self.dels.n
        if n_net <= 0:
            return float("nan")
        ita, wa = self.adds._weighted_sorted()
        itd, wd = self.dels._weighted_sorted()
        lt = wa[ita < x].sum() - (wd[itd < x].sum() if len(itd) else 0.0)
        return float(lt / n_net)

    # ------------------------------------------------------------- serde

    def to_bytes(self) -> bytes:
        a = self.adds.to_bytes()
        d = self.dels.to_bytes()
        return struct.pack("<I", len(a)) + a + d

    @classmethod
    def from_bytes(cls, buf: bytes, seed: int = 42) -> "KllPM":
        (la,) = struct.unpack_from("<I", buf, 0)
        out = cls.__new__(cls)
        out.adds = KllSketch.from_bytes(buf[4:4 + la], seed)
        out.dels = KllSketch.from_bytes(buf[4 + la:], seed)
        out.k = out.adds.k
        return out
