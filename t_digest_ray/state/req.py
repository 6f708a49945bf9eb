"""ReqSketch — relative-error streaming quantiles (third quantile UDAF).

A from-scratch numpy implementation of the Relative Error Quantiles sketch
("Relative Error Streaming Quantiles", Cormode-Karnin-Liberty-Thaler-Veselý,
PODS 2021), matching the behavior of the reference's double-ized copy of the
Apache DataSketches ReqSketch (reference: core/.../datasketches/req/
ReqSketch.java:82-96 data model, ReqCompactor.java:118-148 compaction
schedule, :222-247 section growth and compaction range, ReqSketch.java:388-398
rank-error bound relRseFactor=sqrt(0.0512/3)).

Structure: one compactor per level h; items at level h carry weight 2^h.
A compactor holds ``num_sections`` sections of ``section_size`` items (both
adapt over time: every time the compaction count reaches 2^(num_sections-1),
section_size shrinks by sqrt(2) (even-rounded, >= 4) and num_sections
doubles). A compaction sorts the buffer, keeps the "accurate" end intact
(high ranks for hra=True), and promotes a random even/odd half of the
compacted range to the next level — the number of compacted sections follows
the deterministic trailing-ones schedule of the compaction counter, which
concentrates compactions on the least-accurate items.

Merge: per-level buffer concat with state OR (ReqCompactor.java:211-227),
then compress while over capacity — associative within the published bound.

Determinism: incoming batches are sorted before insertion and the coin RNG
is seeded at construction, so a sketch built from the same multiset of
batches is reproducible (required for retry determinism, SURVEY.md §4).
"""

from __future__ import annotations

import struct

import numpy as np

_SQRT2 = float(np.sqrt(2.0))
INIT_SECTIONS = 3
MIN_K = 4
NOM_CAP_MULT = 2
# ReqSketch.java:79 — relative-error RSE factor for one std dev
REL_RSE_FACTOR = float(np.sqrt(0.0512 / INIT_SECTIONS))


def _nearest_even(x: float) -> int:
    return int(round(x / 2.0)) << 1


def _trailing_ones(v: int) -> int:
    n = 0
    while v & 1:
        v >>= 1
        n += 1
    return n


class _Compactor:
    __slots__ = ("lg_weight", "hra", "state", "section_size_flt",
                 "section_size", "num_sections", "items")

    def __init__(self, lg_weight: int, hra: bool, section_size: int):
        self.lg_weight = lg_weight
        self.hra = hra
        self.state = 0
        self.section_size_flt = float(section_size)
        self.section_size = section_size
        self.num_sections = INIT_SECTIONS
        self.items = np.empty(0, dtype=np.float64)

    def nom_capacity(self) -> int:
        return NOM_CAP_MULT * self.num_sections * self.section_size

    def _ensure_enough_sections(self) -> bool:
        # ReqCompactor.java:231-247
        if (self.state >= (1 << (self.num_sections - 1))
                and self.section_size > MIN_K):
            szf = self.section_size_flt / _SQRT2
            ne = _nearest_even(szf)
            if ne >= MIN_K:
                self.section_size_flt = szf
                self.section_size = ne
                self.num_sections <<= 1
                return True
        return False

    def compact(self, rng: np.random.Generator) -> np.ndarray:
        """Compact once; returns the promoted items (weight doubles)."""
        buf = np.sort(self.items, kind="stable")
        buf_len = len(buf)
        secs = min(_trailing_ones(self.state) + 1, self.num_sections)
        # ReqCompactor.java:253-260
        non_compact = (self.nom_capacity() // 2
                       + (self.num_sections - secs) * self.section_size)
        if (buf_len - non_compact) & 1:
            non_compact += 1
        if self.hra:
            lo, hi = 0, buf_len - non_compact
        else:
            lo, hi = non_compact, buf_len
        if hi - lo < 2:  # nothing sensible to compact
            self.items = buf
            self.state += 1
            self._ensure_enough_sections()
            return np.empty(0, dtype=np.float64)
        coin = int(rng.integers(0, 2))
        promote = buf[lo + coin:hi:2].copy()
        self.items = np.concatenate([buf[:lo], buf[hi:]])
        self.state += 1
        self._ensure_enough_sections()
        return promote

    def extend(self, values: np.ndarray) -> None:
        if len(values):
            self.items = np.concatenate([self.items, values])

    def merge_from(self, other: "_Compactor") -> None:
        # ReqCompactor.java:211-227: OR the schedules, re-derive sections
        self.state |= other.state
        while self._ensure_enough_sections():
            pass
        self.extend(other.items)


class ReqSketch:
    """Relative-error quantile sketch (Sketch-protocol compatible)."""

    def __init__(self, k: int = 12, hra: bool = True, seed: int = 0xC0FFEE):
        if k & 1 or not (MIN_K <= k <= 1024):
            raise ValueError("k must be even in [4, 1024]")
        self.k = k
        self.hra = hra
        self.n = 0
        self.min = np.inf
        self.max = -np.inf
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        self.compactors: list[_Compactor] = [_Compactor(0, hra, k)]

    # ------------------------------------------------------------- update

    def _retained(self) -> int:
        return sum(len(c.items) for c in self.compactors)

    def _max_nom_size(self) -> int:
        return sum(c.nom_capacity() for c in self.compactors)

    def update_batch(self, values, weights=None) -> None:
        v = np.asarray(values, dtype=np.float64)
        keep = ~np.isnan(v)
        v = v[keep]
        if weights is not None:
            w = np.asarray(weights)[keep]
            if not np.all(w == 1):
                # integer weights = repeated insertion (small w expected);
                # fractional weights have no rank-sketch meaning here, so
                # reject them instead of silently flooring (TDigest in the
                # same Sketch protocol DOES honor float weights)
                wi = np.asarray(w, dtype=np.int64)
                if not np.array_equal(wi, np.asarray(w, dtype=np.float64)):
                    raise ValueError(
                        "ReqSketch requires integer weights "
                        "(fractional weights are not representable)")
                v = np.repeat(v, wi)
        if not len(v):
            return
        v = np.sort(v, kind="stable")  # order-canonical per batch
        self.min = min(self.min, float(v[0]))
        self.max = max(self.max, float(v[-1]))
        self.n += len(v)
        # insert in chunks no bigger than level-0 capacity so intermediate
        # compactions fire at the same thresholds as one-at-a-time insertion
        c0 = self.compactors[0]
        pos = 0
        while pos < len(v):
            room = max(c0.nom_capacity() * 2 - len(c0.items), c0.nom_capacity())
            c0.extend(v[pos:pos + room])
            pos += room
            if self._retained() >= self._max_nom_size():
                self._compress()
            c0 = self.compactors[0]

    def _compress(self) -> None:
        # ReqSketch compress: sweep levels, compacting any full compactor
        h = 0
        while h < len(self.compactors):
            c = self.compactors[h]
            if len(c.items) >= c.nom_capacity():
                if h + 1 == len(self.compactors):
                    self.compactors.append(
                        _Compactor(h + 1, self.hra, c.section_size))
                promoted = c.compact(self._rng)
                self.compactors[h + 1].extend(promoted)
            h += 1

    # -------------------------------------------------------------- merge

    def merge(self, *others: "ReqSketch") -> "ReqSketch":
        for o in others:
            if o.n == 0:
                continue
            self.n += o.n
            self.min = min(self.min, o.min)
            self.max = max(self.max, o.max)
            while len(self.compactors) < len(o.compactors):
                h = len(self.compactors)
                self.compactors.append(
                    _Compactor(h, self.hra, self.compactors[-1].section_size))
            for h, oc in enumerate(o.compactors):
                self.compactors[h].merge_from(oc)
            while self._retained() >= self._max_nom_size():
                before = self._retained()
                self._compress()
                if self._retained() >= before:  # no compactor was over nom
                    break
        return self

    # ------------------------------------------------------------- query

    def _aux(self):
        """(sorted items, cumulative weights) across all levels."""
        parts, weights = [], []
        for c in self.compactors:
            if len(c.items):
                parts.append(c.items)
                weights.append(np.full(len(c.items), 1 << c.lg_weight,
                                       dtype=np.float64))
        if not parts:
            return (np.empty(0, dtype=np.float64),
                    np.empty(0, dtype=np.float64))
        items = np.concatenate(parts)
        w = np.concatenate(weights)
        order = np.argsort(items, kind="stable")
        return items[order], np.cumsum(w[order])

    def rank_batch(self, values) -> np.ndarray:
        """Normalized inclusive rank: weight of items <= x, / n."""
        items, cw = self._aux()
        v = np.asarray(values, dtype=np.float64)
        if self.n == 0 or not len(items):
            return np.full(len(v), np.nan)
        idx = np.searchsorted(items, v, side="right")
        counts = np.where(idx > 0, cw[np.maximum(idx - 1, 0)], 0.0)
        return counts / self.n

    def rank(self, value: float) -> float:
        return float(self.rank_batch([value])[0])

    def quantile_batch(self, qs) -> np.ndarray:
        items, cw = self._aux()
        q = np.asarray(qs, dtype=np.float64)
        if self.n == 0 or not len(items):
            return np.full(len(q), np.nan)
        targets = np.clip(q, 0.0, 1.0) * self.n
        idx = np.searchsorted(cw, targets, side="left")
        idx = np.minimum(idx, len(items) - 1)
        return items[idx]

    def quantile(self, q: float) -> float:
        return float(self.quantile_batch([q])[0])

    def rank_rse(self, rank: float, num_std_dev: int = 1) -> float:
        """One-sided rank error bound (ReqSketch.java:388-398)."""
        rel = REL_RSE_FACTOR / self.k * ((1.0 - rank) if self.hra else rank)
        return num_std_dev * rel

    # -------------------------------------------------------------- serde

    _HDR = struct.Struct("<4sBBHqdd")
    _CHDR = struct.Struct("<qdBBHi")
    _MAGIC = b"REQ1"

    def to_bytes(self) -> bytes:
        out = [self._HDR.pack(self._MAGIC, 1 if self.hra else 0, 0, self.k,
                              self.n, self.min, self.max)]
        out.append(struct.pack("<i", len(self.compactors)))
        for c in self.compactors:
            out.append(self._CHDR.pack(c.state, c.section_size_flt,
                                       c.lg_weight, c.num_sections,
                                       c.section_size, len(c.items)))
            out.append(np.ascontiguousarray(c.items).tobytes())
        return b"".join(out)

    @classmethod
    def from_bytes(cls, b: bytes) -> "ReqSketch":
        magic, hra, _, k, n, mn, mx = cls._HDR.unpack_from(b, 0)
        if magic != cls._MAGIC:
            raise ValueError("bad ReqSketch encoding")
        sk = cls(k, bool(hra))
        sk.n, sk.min, sk.max = n, mn, mx
        off = cls._HDR.size
        (n_comp,) = struct.unpack_from("<i", b, off)
        off += 4
        sk.compactors = []
        for _ in range(n_comp):
            state, ssf, lgw, nsec, ssz, cnt = cls._CHDR.unpack_from(b, off)
            off += cls._CHDR.size
            c = _Compactor(lgw, bool(hra), k)
            c.state, c.section_size_flt = state, ssf
            c.num_sections, c.section_size = nsec, ssz
            c.items = np.frombuffer(b, dtype=np.float64, count=cnt,
                                    offset=off).copy()
            off += 8 * cnt
            sk.compactors.append(c)
        return sk


# --------------------------------------------------- DataSketches interop

_REQ_FAMILY = 17
_REQ_SER_VER = 1
_RF_EMPTY, _RF_HRA, _RF_RAW, _RF_L0SORT = 4, 8, 16, 32


def _compactor_to_java(c: _Compactor) -> bytes:
    """ReqCompactor.java:297-310 layout: i64 state, f32 sectionSizeFlt,
    u8 lgWeight, u8 numSections, 2 pad, i32 count, count x f64 items."""
    return (struct.pack("<qfBBxxi", c.state, c.section_size_flt,
                        c.lg_weight, c.num_sections, len(c.items))
            + np.asarray(c.items, dtype="<f8").tobytes())


def _compactor_from_java(buf: bytes, off: int, hra: bool
                         ) -> tuple[_Compactor, int]:
    state, ssf, lgw, nsec, count = struct.unpack_from("<qfBBxxi", buf, off)
    off += struct.calcsize("<qfBBxxi")
    items = np.frombuffer(buf, "<f8", count=count, offset=off).copy()
    off += 8 * count
    c = _Compactor(lgw, hra, _nearest_even(ssf))
    c.state = state
    c.section_size_flt = ssf
    c.section_size = int(round(ssf))
    c.num_sections = nsec
    c.items = items
    return c, off


def req_to_java_bytes(sk: "ReqSketch") -> bytes:
    """Serialize in the reference's ReqSerDe layout (ReqSerDe.java:38-130
    formats EMPTY/RAWITEMS/EXACT/ESTIMATION, little-endian)."""
    is_empty = sk.n == 0
    raw = 0 < sk.n <= MIN_K
    estimation = len(sk.compactors) > 1
    pre_ints = 4 if estimation else 2
    flags = ((_RF_EMPTY if is_empty else 0)
             | (_RF_HRA if sk.hra else 0)
             | (_RF_RAW if raw else 0)
             | _RF_L0SORT)  # our buffers are kept sorted after compaction
    n_comp = 0 if is_empty else len(sk.compactors)
    n_raw = sk.n if raw else 0
    out = bytearray(struct.pack("<BBBBHBB", pre_ints, _REQ_SER_VER,
                                _REQ_FAMILY, flags, sk.k, n_comp, n_raw))
    if is_empty:
        return bytes(out)
    if raw:
        items = np.sort(sk.compactors[0].items)
        out += items.astype("<f8").tobytes()
        return bytes(out)
    if estimation:
        out += struct.pack("<qdd", sk.n, sk.min, sk.max)
        for c in sk.compactors:
            out += _compactor_to_java(c)
    else:  # EXACT: single compactor, stats derived on decode
        out += _compactor_to_java(sk.compactors[0])
    return bytes(out)


def req_from_java_bytes(buf: bytes, seed: int = 0xC0FFEE) -> "ReqSketch":
    """Decode the ReqSerDe layout (ReqSerDe.java:134-196 heapify)."""
    pre_ints, ser_ver, family, flags, k, n_comp, n_raw = \
        struct.unpack_from("<BBBBHBB", buf, 0)
    if family != _REQ_FAMILY:
        raise ValueError(f"not a REQ sketch (family {family})")
    hra = bool(flags & _RF_HRA)
    sk = ReqSketch(k, hra, seed=seed)
    if flags & _RF_EMPTY:
        return sk
    if flags & _RF_RAW:
        items = np.frombuffer(buf, "<f8", count=n_raw, offset=8)
        sk.update_batch(items)
        return sk
    off = 8
    if n_comp > 1:  # ESTIMATION
        n, mn, mx = struct.unpack_from("<qdd", buf, off)
        off += struct.calcsize("<qdd")
        sk.compactors = []
        for _ in range(n_comp):
            c, off = _compactor_from_java(buf, off, hra)
            sk.compactors.append(c)
        sk.n = n
        sk.min, sk.max = mn, mx
    else:  # EXACT
        c, off = _compactor_from_java(buf, off, hra)
        sk.compactors = [c]
        sk.n = len(c.items)
        sk.min = float(c.items.min())
        sk.max = float(c.items.max())
    return sk
