"""AVLTreeDigest-equivalent: clustering-variant t-digest (second impl).

Reference semantics: AVLTreeDigest.java:85-161 (nearest-centroid insert with
uniform reservoir tie-breaking among all candidates with room under the
scale-function limit ``count*min(max(q0),max(q1))``), :164-208 (in-order
greedy pairwise re-merge compress), auto-compress at 20*compression
centroids (:156-159). The order-statistic AVL tree is replaced by sorted
arrays + searchsorted/cumsum (SURVEY.md §2.1 #15).

Role: optional second implementation kept for accuracy comparisons against
the merging digest (SURVEY.md #13 note) — the insert path is inherently
per-point sequential, so this is NOT the distributed hot path (that is
``state.tdigest.TDigest``); it plugs into the same Sketch protocol and
query/serde surface.
"""

from __future__ import annotations

import struct

import numpy as np

from .scale_functions import K_2, ScaleFunction, get_scale
from .tdigest import TDigest, _weighted_average


class AVLTreeDigest:
    def __init__(self, compression: float = 100.0,
                 scale: ScaleFunction | str = K_2, seed: int = 42):
        self.compression = max(float(compression), 10.0)
        self.scale = get_scale(scale)
        self._means: list[float] = []
        self._weights: list[float] = []
        self.count = 0.0
        self.min = np.inf
        self.max = -np.inf
        self._rng = np.random.default_rng(seed)

    # ------------------------------------------------------------- update

    def update(self, x: float, w: float = 1.0) -> None:
        if np.isnan(x):
            raise ValueError("cannot add NaN")
        self.min = min(self.min, x)
        self.max = max(self.max, x)
        means, weights = self._means, self._weights
        if not means:
            means.append(float(x))
            weights.append(float(w))
            self.count = float(w)
            return
        m = np.asarray(means)
        i = int(np.searchsorted(m, x))
        # nearest distance among the (sorted) centroids around x
        cands = []
        if i > 0:
            cands.append(i - 1)
        if i < len(m):
            cands.append(i)
        min_d = min(abs(m[j] - x) for j in cands)
        # expand to the full run of centroids at exactly min_d (repeated
        # means produce runs; AVLTreeDigest.java:104-115 scans them all)
        lo = i
        while lo > 0 and abs(m[lo - 1] - x) == min_d:
            lo -= 1
        hi = i
        while hi < len(m) and abs(m[hi] - x) == min_d:
            hi += 1
        head = np.concatenate([[0.0], np.cumsum(self._weights)])
        closest = -1
        n_eligible = 0
        norm = self.scale.normalizer(self.compression, self.count)
        for j in range(lo, hi):
            if abs(m[j] - x) != min_d:
                continue
            q0 = head[j] / self.count
            q1 = q0 + weights[j] / self.count
            limit = self.count * min(
                self.scale.max_size(q0, norm), self.scale.max_size(q1, norm))
            if weights[j] + w <= limit:
                n_eligible += 1
                # uniform reservoir choice among eligible candidates
                if self._rng.random() < 1.0 / n_eligible:
                    closest = j
        if closest < 0:
            means.insert(i, float(x))
            weights.insert(i, float(w))
        else:
            means[closest] = _weighted_average(
                means[closest], weights[closest], x, w)
            weights[closest] += w
        self.count += w
        if len(means) > 20 * self.compression:
            self.compress()

    def update_batch(self, values, weights=None) -> None:
        v = np.asarray(values, dtype=np.float64)
        keep = ~np.isnan(v)
        v = v[keep]
        w = (np.asarray(weights, dtype=np.float64)[keep]
             if weights is not None else np.ones(len(v)))
        for x, wi in zip(v, w):
            self.update(float(x), float(wi))

    # ----------------------------------------------------------- compress

    def compress(self) -> None:
        """In-order greedy pairwise re-merge (AVLTreeDigest.java:164-208)."""
        if len(self._means) <= 1:
            return
        norm = self.scale.normalizer(self.compression, self.count)
        out_m: list[float] = [self._means[0]]
        out_w: list[float] = [self._weights[0]]
        n0 = 0.0
        k0 = self.count * self.scale.max_size(n0 / self.count, norm)
        n1 = out_w[0]
        for mean, w1 in zip(self._means[1:], self._weights[1:]):
            k1 = self.count * self.scale.max_size(
                (n1 + w1) / self.count, norm)
            if out_w[-1] + w1 > min(k0, k1):
                n0 = n1
                k0 = self.count * self.scale.max_size(n0 / self.count, norm)
                out_m.append(mean)
                out_w.append(w1)
            else:
                out_m[-1] = _weighted_average(out_m[-1], out_w[-1], mean, w1)
                out_w[-1] += w1
            n1 += w1
        self._means, self._weights = out_m, out_w

    # -------------------------------------------------------------- merge

    def merge(self, *others: "AVLTreeDigest") -> "AVLTreeDigest":
        """Digest-of-digests: re-insert others' centroids as weighted points
        in randomized order (AbstractTDigest.add(TDigest) semantics,
        AVLTreeDigest.add(List) AVLTreeDigest.java:76-83)."""
        ms, ws = [], []
        for o in others:
            ms.extend(o._means)
            ws.extend(o._weights)
            if o.count:
                self.min = min(self.min, o.min)
                self.max = max(self.max, o.max)
        order = self._rng.permutation(len(ms))
        for i in order:
            self.update(ms[i], ws[i])
        return self

    # ------------------------------------------------------------- query

    def _view(self) -> TDigest:
        """Read-only TDigest view over the centroids — shares the reference
        cdf/quantile interpolation (AVLTreeDigest.java:226-468 implements
        the same singleton-aware rules)."""
        t = TDigest(self.compression, self.scale)
        n = len(self._means)
        t._mean = np.asarray(self._means, dtype=np.float64)
        t._weight = np.asarray(self._weights, dtype=np.float64)
        t._n = n
        t._total = float(self.count)
        t.min = self.min
        t.max = self.max
        return t

    @property
    def size(self) -> float:
        return self.count

    @property
    def centroid_count(self) -> int:
        return len(self._means)

    def centroids(self) -> tuple[np.ndarray, np.ndarray]:
        return (np.asarray(self._means, dtype=np.float64),
                np.asarray(self._weights, dtype=np.float64))

    def quantile(self, q: float) -> float:
        return self._view().quantile(q)

    def quantile_batch(self, qs) -> np.ndarray:
        return self._view().quantile_batch(qs)

    def cdf(self, x: float) -> float:
        return self._view().cdf(x)

    def cdf_batch(self, xs) -> np.ndarray:
        return self._view().cdf_batch(xs)

    # -------------------------------------------------------------- serde

    _HDR = struct.Struct("<4sdddqd")
    _MAGIC = b"AVL1"

    def to_bytes(self) -> bytes:
        n = len(self._means)
        return b"".join([
            self._HDR.pack(self._MAGIC, self.compression, self.min,
                           self.max, n, self.count),
            np.asarray(self._means, dtype=np.float64).tobytes(),
            np.asarray(self._weights, dtype=np.float64).tobytes(),
        ])

    @classmethod
    def from_bytes(cls, b: bytes,
                   scale: ScaleFunction | str = K_2) -> "AVLTreeDigest":
        magic, comp, mn, mx, n, count = cls._HDR.unpack_from(b, 0)
        if magic != cls._MAGIC:
            raise ValueError("bad AVLTreeDigest encoding")
        d = cls(comp, scale)
        off = cls._HDR.size
        d._means = list(np.frombuffer(b, np.float64, n, off))
        d._weights = list(np.frombuffer(b, np.float64, n, off + 8 * n))
        d.min, d.max, d.count = mn, mx, count
        return d

    _SHDR = struct.Struct("<4sfddq")
    _SMAGIC = b"AVS1"

    def to_small_bytes(self) -> bytes:
        """Compact encoding: delta-encoded float32 means + varint counts
        (the reference's small AVL layout, AVLTreeDigest.java:508-547)."""
        from ..functions.varint import encode_varint

        means = np.asarray(self._means, dtype=np.float64)
        deltas = np.diff(means, prepend=0.0).astype(np.float32)
        out = bytearray(self._SHDR.pack(self._SMAGIC, self.compression,
                                        self.min, self.max, len(means)))
        out += deltas.tobytes()
        for w in self._weights:
            encode_varint(out, int(round(w)))
        return bytes(out)

    @classmethod
    def from_small_bytes(cls, b: bytes,
                         scale: ScaleFunction | str = K_2) -> "AVLTreeDigest":
        from ..functions.varint import decode_varint_array

        magic, comp, mn, mx, n = cls._SHDR.unpack_from(b, 0)
        if magic != cls._SMAGIC:
            raise ValueError("bad small AVLTreeDigest encoding")
        off = cls._SHDR.size
        deltas = np.frombuffer(b, np.float32, n, off).astype(np.float64)
        weights, _ = decode_varint_array(b, n, off + 4 * n)
        d = cls(comp, scale)
        d._means = list(np.cumsum(deltas))
        d._weights = [float(w) for w in weights]
        d.min, d.max = mn, mx
        d.count = float(sum(d._weights))
        return d

    # ----------------------------------------------- Java-interop encoding

    # AVLTreeDigest.java:501-591: big-endian ByteBuffer layout.
    # VERBOSE(1): i32 tag, f64 min, f64 max, f64 compression (the
    # reference casts compression to float before widening — mirrored),
    # i32 n, n x f64 means, n x i32 counts.
    # SMALL(2): i32 tag, f64 min, f64 max, f64 compression, i32 n,
    # n x f32 delta-encoded means, n x varint counts.
    _JAVA_VERBOSE = 1
    _JAVA_SMALL = 2

    def to_java_bytes(self, small: bool = False) -> bytes:
        """Byte-compatible with the reference's AVLTreeDigest asBytes /
        asSmallBytes, so sketches cross into the Java ecosystem."""
        from ..functions.varint import encode_varint

        counts = [int(round(w)) for w in self._weights]
        if any(abs(c - w) > 1e-9 for c, w in zip(counts, self._weights)):
            raise ValueError("Java layout requires integer centroid counts")
        if any(c > 0x7FFFFFFF for c in counts):
            raise ValueError("centroid count exceeds Java int range")
        out = bytearray()
        if small:
            out += struct.pack(">idddi", self._JAVA_SMALL, self.min,
                               self.max, self.compression, len(self._means))
            x = 0.0
            for m in self._means:
                out += struct.pack(">f", m - x)
                x = m
            for c in counts:
                # reference varint is byte-order-free (7-bit groups)
                encode_varint(out, c)
        else:
            out += struct.pack(">iddd", self._JAVA_VERBOSE, self.min,
                               self.max,
                               float(np.float32(self.compression)))
            out += struct.pack(">i", len(self._means))
            for m in self._means:
                out += struct.pack(">d", m)
            for c in counts:
                out += struct.pack(">i", c)
        return bytes(out)

    @classmethod
    def from_java_bytes(cls, b: bytes,
                        scale: ScaleFunction | str = K_2) -> "AVLTreeDigest":
        """Decode the reference's asBytes/asSmallBytes layouts. Mirrors
        fromBytes semantics: centroids are re-added through clustering."""
        from ..functions.varint import decode_varint

        (tag,) = struct.unpack_from(">i", b, 0)
        if tag == cls._JAVA_VERBOSE:
            mn, mx, comp = struct.unpack_from(">ddd", b, 4)
            (n,) = struct.unpack_from(">i", b, 28)
            off = 32
            means = list(struct.unpack_from(f">{n}d", b, off))
            off += 8 * n
            counts = list(struct.unpack_from(f">{n}i", b, off))
        elif tag == cls._JAVA_SMALL:
            mn, mx, comp = struct.unpack_from(">ddd", b, 4)
            (n,) = struct.unpack_from(">i", b, 28)
            off = 32
            means = []
            x = 0.0
            for i in range(n):
                (delta,) = struct.unpack_from(">f", b, off)
                off += 4
                x += delta
                means.append(x)
            counts = []
            for _ in range(n):
                c, off = decode_varint(b, off)
                counts.append(c)
        else:
            raise ValueError(f"invalid AVLTreeDigest Java encoding {tag}")
        d = cls(comp, scale)
        for m, c in zip(means, counts):
            d.update(float(m), float(c))
        d.min, d.max = mn, mx
        return d
