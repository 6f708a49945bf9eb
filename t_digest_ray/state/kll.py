"""KLL quantile sketch over float64 streams.

Built from the published algorithm (Karnin, Lang, Liberty: "Optimal quantile
approximation in streams", FOCS 2016) with the practical refinements the
reference's double-ized DataSketches copy uses (KllDoublesSketch.java:238-251,
903-921, 768-790): geometrically-capped levels (cap factor 2/3, floor 8),
lazy compaction of the lowest over-full level with a random even/odd
downsampling offset, and level-wise merge followed by compaction.

Published error bound carried in tests: normalized rank error for cdf-style
queries ~ ``2.296 / k**0.9723`` (KllDoublesSketch.java:534-538); the default
k=200 gives ~1.65%.

Compaction randomness is drawn from a per-sketch deterministic counter-based
generator (splitmix64 of a seed + compaction counter), so a retried Ray task
reproduces its partial sketch bit-for-bit.
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.hashing import splitmix64

DEFAULT_K = 200
_CAP_FACTOR = 2.0 / 3.0
_MIN_CAP = 8
_HEADER_FMT = "<4siqddi"  # magic, k, n, min, max, num_levels
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)


def _level_capacity(k: int, num_levels: int, height: int) -> int:
    """Capacity of the level at ``height`` when ``num_levels`` exist: the top
    level holds ~k items, lower levels shrink by 2/3 per step, floor 8."""
    depth = num_levels - height - 1
    return max(int(np.ceil(k * _CAP_FACTOR ** depth)), _MIN_CAP)


class KllSketch:
    """Mergeable KLL sketch; items at level h carry weight 2**h."""

    def __init__(self, k: int = DEFAULT_K, seed: int = 42):
        if not 8 <= k <= 65535:
            raise ValueError(f"k must be in [8, 65535], got {k}")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.min = np.inf
        self.max = -np.inf
        self._seed = seed
        self._compactions = 0

    # ------------------------------------------------------------------ util

    def _rand_offset(self) -> int:
        self._compactions += 1
        return int(splitmix64(np.asarray(
            [self._seed * 0x9E3779B9 + self._compactions],
            dtype=np.uint64))[0] & np.uint64(1))

    def _total_capacity(self) -> int:
        L = len(self.levels)
        return sum(_level_capacity(self.k, L, h) for h in range(L))

    def _num_items(self) -> int:
        return sum(len(lv) for lv in self.levels)

    def _compress(self) -> None:
        """Compact the lowest over-full level (KLL lazy compaction)."""
        while self._num_items() > self._total_capacity():
            L = len(self.levels)
            for h in range(L):
                cap = _level_capacity(self.k, L, h)
                if len(self.levels[h]) >= cap and len(self.levels[h]) >= 2:
                    items = np.sort(self.levels[h])
                    o = self._rand_offset()
                    m = len(items)
                    n_pairs = (m - o) // 2
                    promoted = items[o:o + 2 * n_pairs:2]
                    leftover = np.concatenate(
                        [items[:o], items[o + 2 * n_pairs:]])
                    self.levels[h] = leftover
                    if h + 1 == L:
                        self.levels.append(np.empty(0, dtype=np.float64))
                    self.levels[h + 1] = np.concatenate(
                        [self.levels[h + 1], promoted])
                    break
            else:
                # nothing compactable (all levels tiny): grow the hierarchy
                self.levels.append(np.empty(0, dtype=np.float64))

    # -------------------------------------------------------------- protocol

    def update_batch(self, values, weights=None) -> None:
        if weights is not None:
            raise ValueError("KLL supports unit weights only")
        x = np.ascontiguousarray(values, dtype=np.float64)
        if x.size == 0:
            return
        if np.isnan(x).any():
            raise ValueError("Cannot add NaN to KLL sketch")
        self.min = min(self.min, float(x.min()))
        self.max = max(self.max, float(x.max()))
        self.n += x.size
        cap0 = _level_capacity(self.k, len(self.levels), 0)
        step = max(cap0, 1024)
        for pos in range(0, x.size, step):
            self.levels[0] = np.concatenate([self.levels[0],
                                             x[pos:pos + step]])
            self._compress()

    def merge(self, *others: "KllSketch") -> "KllSketch":
        """Level-wise concatenation then compaction (KllDoublesSketch.java:
        768-790 semantics)."""
        for o in others:
            if o.n == 0:
                continue
            self.min = min(self.min, o.min)
            self.max = max(self.max, o.max)
            self.n += o.n
            while len(self.levels) < len(o.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            for h, lv in enumerate(o.levels):
                if len(lv):
                    self.levels[h] = np.concatenate([self.levels[h], lv])
            self._compress()
        return self

    # --------------------------------------------------------------- queries

    def _weighted_sorted(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, lv in enumerate(self.levels):
            if len(lv):
                items.append(lv)
                weights.append(np.full(len(lv), 2 ** h, dtype=np.float64))
        if not items:
            return (np.empty(0), np.empty(0))
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q should be in [0,1], got {q}")
        if self.n == 0:
            return float("nan")
        it, w = self._weighted_sorted()
        cum = np.cumsum(w)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        idx = min(idx, len(it) - 1)
        if q == 0.0:
            return self.min
        if q == 1.0:
            return self.max
        return float(it[idx])

    def quantile_batch(self, qs) -> np.ndarray:
        return np.asarray([self.quantile(float(q)) for q in np.atleast_1d(qs)])

    def rank(self, x: float) -> float:
        """Normalized mid-rank of x (getRank, KllDoublesSketch.java:584)."""
        if self.n == 0:
            return float("nan")
        it, w = self._weighted_sorted()
        lt = w[it < x].sum()
        eq = w[it == x].sum()
        return float((lt + eq / 2.0) / w.sum())

    cdf = rank

    def cdf_batch(self, xs) -> np.ndarray:
        return np.asarray([self.rank(float(x)) for x in np.atleast_1d(xs)])

    def pmf(self, split_points) -> np.ndarray:
        """Probability mass function over the given ascending split points
        (KllDoublesSketch.java:626-659 getPMF via getPmfOrCdf:941-971):
        returns ``len(split_points) + 1`` masses where bucket ``j`` holds
        the normalized weight of items with ``sp[j-1] <= item < sp[j]``
        (bucket 0 = below sp[0], last = at/above sp[-1]). The published
        guarantee uses the DOUBLE-sided error
        ``normalized_rank_error(k, pmf=True)`` per bucket."""
        sp = np.ascontiguousarray(split_points, dtype=np.float64)
        if sp.size == 0 or np.isnan(sp).any():
            raise ValueError("split points must be non-empty and NaN-free")
        if sp.size > 1 and not (np.diff(sp) > 0).all():
            raise ValueError("split points must be strictly ascending")
        if self.n == 0:
            return np.full(sp.size + 1, np.nan)
        it, w = self._weighted_sorted()
        j = np.searchsorted(sp, it, side="right")
        return np.bincount(j, weights=w,
                           minlength=sp.size + 1) / float(self.n)

    def cdf_points(self, split_points) -> np.ndarray:
        """Cumulative form of :meth:`pmf` (getCDF,
        KllDoublesSketch.java:420-422): entry ``j`` is the normalized
        weight of items ``< sp[j]``, final entry 1.0."""
        return np.cumsum(self.pmf(split_points))

    def quantile_lower_bound(self, fraction: float) -> float:
        """Lower bound of the value interval containing the true quantile
        at >=99% confidence (KllDoublesSketch.java:637-639):
        quantile(max(0, fraction - eps_single))."""
        return self.quantile(max(
            0.0, fraction - self.normalized_rank_error(self.k)))

    def quantile_upper_bound(self, fraction: float) -> float:
        """Upper bound twin (KllDoublesSketch.java:626-628):
        quantile(min(1, fraction + eps_single))."""
        return self.quantile(min(
            1.0, fraction + self.normalized_rank_error(self.k)))

    @property
    def size(self) -> int:
        return self.n

    @staticmethod
    def normalized_rank_error(k: int, pmf: bool = False) -> float:
        """Published rank error (KllDoublesSketch.java:528-538): the
        single-sided constant for rank/quantile/cdf queries, or the
        double-sided ``2.446/k^0.9433`` for getPMF when ``pmf=True``."""
        return 2.446 / k ** 0.9433 if pmf else 2.296 / k ** 0.9723

    @staticmethod
    def k_from_epsilon(epsilon: float, pmf: bool = False) -> int:
        """Inverse of normalized_rank_error
        (KllDoublesSketch.java:444-454 getKFromEpsilon): smallest k whose
        published error is <= epsilon, clamped to [8, 65535]."""
        import math
        eps = max(epsilon, 4.7634e-5)
        kdbl = (math.exp(math.log(2.446 / eps) / 0.9433) if pmf
                else math.exp(math.log(2.296 / eps) / 0.9723))
        krnd = round(kdbl)
        k = int(krnd if abs(krnd - kdbl) < 1e-6 else math.ceil(kdbl))
        return max(8, min(65535, k))

    # ----------------------------------------------------------------- serde

    def to_bytes(self) -> bytes:
        head = struct.pack(_HEADER_FMT, b"KLL1", self.k, self.n,
                            self.min if self.n else np.inf,
                            self.max if self.n else -np.inf,
                            len(self.levels))
        lens = np.asarray([len(lv) for lv in self.levels], dtype="<i4")
        body = np.concatenate(self.levels) if self._num_items() else \
            np.empty(0, dtype=np.float64)
        return head + lens.tobytes() + body.astype("<f8").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes, seed: int = 42) -> "KllSketch":
        magic, k, n, mn, mx, num_levels = struct.unpack_from(_HEADER_FMT, buf, 0)
        if magic != b"KLL1":
            raise ValueError(f"bad KLL magic {magic!r}")
        sk = cls(k, seed=seed)
        sk.n = n
        sk.min = mn
        sk.max = mx
        off = _HEADER_SIZE
        lens = np.frombuffer(buf, dtype="<i4", count=num_levels, offset=off)
        off += 4 * num_levels
        items = np.frombuffer(buf, dtype="<f8", offset=off)
        sk.levels = []
        pos = 0
        for ln in lens:
            sk.levels.append(items[pos:pos + ln].astype(np.float64))
            pos += ln
        return sk


# --------------------------------------------------- DataSketches interop

_DS_FAMILY_KLL = 15   # Apache DataSketches Family.KLL id
_DS_M = 8             # DEFAULT_M (minimum level width)
_F_EMPTY, _F_L0_SORTED, _F_SINGLE = 1, 2, 4


def _ds_capacity(k: int, num_levels: int) -> int:
    return sum(_level_capacity(k, num_levels, h) for h in range(num_levels))


def kll_to_java_bytes(sk: KllSketch) -> bytes:
    """Serialize in the reference's DataSketches KllDoublesSketch layout
    (KllDoublesSketch.java:183-219 preamble, :796-830 toByteArray):
    little-endian preamble, absolute level offsets into the capacity
    array (last offset derived), min/max doubles, then the retained items
    packed level 0 upward. Levels above 0 are emitted sorted (the
    DataSketches invariant; item order within a level has no semantic
    weight in our engine)."""
    is_empty = sk.n == 0
    is_single = sk.n == 1
    pre_ints = 2 if (is_empty or is_single) else 5
    ser_ver = 2 if is_single else 1
    flags = ((_F_EMPTY if is_empty else 0)
             | (_F_SINGLE if is_single else 0))
    out = bytearray(struct.pack("<BBBBHBB", pre_ints, ser_ver,
                                _DS_FAMILY_KLL, flags, sk.k, _DS_M, 0))
    if is_empty:
        return bytes(out)
    if is_single:
        item = next(float(lv[0]) for lv in sk.levels if len(lv))
        out += struct.pack("<d", item)
        return bytes(out)
    L = len(sk.levels)
    cap = _ds_capacity(sk.k, L)
    sizes = [len(lv) for lv in sk.levels]
    # levels_[L] = capacity; level h spans [levels_[h], levels_[h+1]);
    # all free space sits below levels_[0]
    offsets = [0] * (L + 1)
    offsets[L] = cap
    for h in range(L - 1, -1, -1):
        offsets[h] = offsets[h + 1] - sizes[h]
    out += struct.pack("<qHBB", sk.n, sk.k, L, 0)
    out += struct.pack(f"<{L}i", *offsets[:L])
    out += struct.pack("<dd", sk.min, sk.max)
    for h, lv in enumerate(sk.levels):
        items = np.sort(lv) if h > 0 else np.asarray(lv)
        out += items.astype("<f8").tobytes()
    return bytes(out)


def kll_from_java_bytes(buf: bytes, seed: int = 42) -> KllSketch:
    """Decode the DataSketches KllDoublesSketch layout
    (KllDoublesSketch.java:303-353 heapify semantics)."""
    pre_ints, ser_ver, family, flags, k, m, _ = struct.unpack_from(
        "<BBBBHBB", buf, 0)
    if family != _DS_FAMILY_KLL:
        raise ValueError(f"not a KLL sketch (family {family})")
    if m != _DS_M:
        raise ValueError(f"M must be {_DS_M}, got {m}")
    sk = KllSketch(k, seed=seed)
    if flags & _F_EMPTY:
        return sk
    if flags & _F_SINGLE:
        (item,) = struct.unpack_from("<d", buf, 8)
        sk.levels = [np.asarray([item], dtype=np.float64)]
        sk.n = 1
        sk.min = sk.max = item
        return sk
    n, min_k, L, _ = struct.unpack_from("<qHBB", buf, 8)
    off = 20
    offsets = list(struct.unpack_from(f"<{L}i", buf, off))
    off += 4 * L
    offsets.append(_ds_capacity(k, L))
    mn, mx = struct.unpack_from("<dd", buf, off)
    off += 16
    retained = offsets[L] - offsets[0]
    items = np.frombuffer(buf, "<f8", count=retained, offset=off)
    sk.levels = []
    pos = 0
    for h in range(L):
        cnt = offsets[h + 1] - offsets[h]
        sk.levels.append(items[pos:pos + cnt].astype(np.float64))
        pos += cnt
    sk.n = n
    sk.min, sk.max = mn, mx
    return sk
