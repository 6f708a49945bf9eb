"""Frequent Directions — mergeable matrix / covariance sketch.

Built from the published algorithm (Liberty, "Simple and deterministic
matrix sketching", KDD 2013; mergeability per Ghashami, Liberty, Phillips
& Woodruff, SIAM J. Comput. 2016). Not in the reference repo — it extends
the sketch family from scalar streams to the ``embeddings`` modality:
a tiny ``l x d`` summary B of a tall row-stream A (n x d, n unbounded)
with the deterministic spectral guarantee

    0  <=  x^T (A^T A - B^T B) x  <=  ||A||_F^2 * 2 / l      for unit x

i.e. ``A^T A - B^T B`` is PSD with spectral norm at most ``2/l`` of the
stream's total energy — the matrix analogue of Misra-Gries (the paper's
own framing), and like MG it merges: FD(FD(A1) ∪ FD(A2)) keeps the same
bound for A1 ++ A2, so per-partition sketches tree-merge through the
standard groupby topology.

Implementation: a ``2l x d`` buffer; when full, one SVD, subtract the
l-th squared singular value from all (shrink), keep the top l rows.
``update_batch`` consumes row matrices (n x d float32/64) vectorized —
the per-batch cost is the SVD of a (2l x d) matrix, independent of n.
"""

from __future__ import annotations

import struct

import numpy as np

# magic, l, d, n_rows, energy (||A||_F^2) — format string, not a
# struct.Struct instance, so cloudpickle can ship the class by value
_HDR_FMT = "<4siiqd"
_HDR_SIZE = struct.calcsize(_HDR_FMT)


class FreqDir:
    """Frequent-Directions sketch of a stream of d-dimensional rows."""

    __slots__ = ("l", "d", "buf", "fill", "n_rows", "energy")

    def __init__(self, l: int = 16, d: int | None = None):
        if l < 2:
            raise ValueError(f"l must be >= 2, got {l}")
        self.l = int(l)
        self.d = None if d is None else int(d)
        self.buf = None if d is None else np.zeros((2 * l, d))
        self.fill = 0          # occupied rows of buf
        self.n_rows = 0        # total stream rows consumed
        self.energy = 0.0      # exact ||A||_F^2 (running, mergeable)

    def _ensure_dim(self, d: int) -> None:
        if self.d is None:
            self.d = int(d)
            self.buf = np.zeros((2 * self.l, self.d))
        elif self.d != d:
            raise ValueError(f"row dim {d} != sketch dim {self.d}")

    def _shrink(self) -> None:
        """One FD step: SVD the buffer, subtract sigma_l^2, keep top l."""
        _, s, vt = np.linalg.svd(self.buf[:self.fill],
                                 full_matrices=False)
        k = min(self.l, len(s))
        delta = s[k - 1] ** 2 if len(s) >= k else 0.0
        s2 = np.sqrt(np.maximum(s[:k] ** 2 - delta, 0.0))
        self.buf[:] = 0.0
        self.buf[:k] = s2[:, None] * vt[:k]
        # rows with zero shrunk weight are dead — compact them away
        live = s2 > 0.0
        self.fill = int(live.sum())
        if self.fill < k:
            self.buf[:k] = self.buf[:k][np.argsort(~live,
                                                   kind="stable")]
            self.buf[self.fill:k] = 0.0

    def _append(self, rows: np.ndarray) -> None:
        i = 0
        while i < len(rows):
            room = 2 * self.l - self.fill
            take = min(room, len(rows) - i)
            self.buf[self.fill:self.fill + take] = rows[i:i + take]
            self.fill += take
            i += take
            if self.fill >= 2 * self.l:
                self._shrink()

    def update_batch(self, values, weights=None) -> None:
        """``values``: (n, d) row matrix. ``weights`` (optional) scales
        each row's outer-product contribution (row * sqrt(w))."""
        rows = np.asarray(values)
        if rows.dtype == object:
            # Arrow list<float> columns arrive as an object ndarray of
            # per-row arrays — stack into a dense (n, d) matrix
            if rows.size == 0:
                return
            rows = np.stack(rows.tolist()).astype(np.float64)
        else:
            rows = np.asarray(rows, dtype=np.float64)
        if rows.ndim != 2:
            rows = np.atleast_2d(rows)
        if rows.size == 0:
            return
        self._ensure_dim(rows.shape[1])
        if weights is not None:
            w = np.asarray(weights, dtype=np.float64)
            rows = rows * np.sqrt(w)[:, None]
        self.n_rows += len(rows)
        self.energy += float((rows * rows).sum())
        self._append(rows)

    def merge(self, *others: "FreqDir") -> "FreqDir":
        for o in others:
            if o.l != self.l:
                raise ValueError(f"cannot merge FD of l={o.l} into "
                                 f"l={self.l}")
            if o.d is None or o.fill == 0:
                self.n_rows += o.n_rows
                self.energy += o.energy
                continue
            self._ensure_dim(o.d)
            self.n_rows += o.n_rows
            self.energy += o.energy
            self._append(o.buf[:o.fill])
        return self

    # ------------------------------------------------------------ queries

    def summary(self) -> np.ndarray:
        """The l x d sketch matrix B (after a final shrink if the buffer
        holds more than l rows)."""
        if self.buf is None:
            return np.zeros((0, 0))
        if self.fill > self.l:
            self._shrink()
        return self.buf[:self.l].copy()

    def cov_estimate(self) -> np.ndarray:
        """B^T B — the PSD underestimate of A^T A."""
        b = self.summary()
        return b.T @ b

    def error_bound(self) -> float:
        """Deterministic spectral bound on ||A^T A - B^T B||_2
        (Liberty 2013, Thm 1.1 with buffer 2l): 2 * ||A||_F^2 / l."""
        return 2.0 * self.energy / float(self.l)

    def top_energy(self, k: int) -> np.ndarray:
        """Squared singular values of B (descending), first k."""
        b = self.summary()
        if b.size == 0:
            return np.zeros(k)
        s = np.linalg.svd(b, compute_uv=False)
        out = np.zeros(k)
        out[:min(k, len(s))] = (s ** 2)[:k]
        return out

    # ------------------------------------------------------------- serde

    def to_bytes(self) -> bytes:
        b = self.summary()  # canonical form: at most l rows
        fill = min(self.fill, self.l) if self.buf is not None else 0
        d = 0 if self.d is None else self.d
        return (struct.pack(_HDR_FMT, b"FDS1", self.l, d, self.n_rows,
                            self.energy)
                + struct.pack("<i", fill)
                + b[:fill].astype("<f8").tobytes())

    @classmethod
    def from_bytes(cls, buf: bytes) -> "FreqDir":
        magic, l, d, n_rows, energy = struct.unpack_from(_HDR_FMT, buf, 0)
        if magic != b"FDS1":
            raise ValueError(f"bad FreqDir magic {magic!r}")
        out = cls(l, d if d else None)
        out.n_rows = n_rows
        out.energy = energy
        (fill,) = struct.unpack_from("<i", buf, _HDR_SIZE)
        if d and fill:
            rows = np.frombuffer(buf, dtype="<f8", offset=_HDR_SIZE + 4,
                                 count=fill * d).reshape(fill, d)
            out.buf[:fill] = rows
            out.fill = fill
        return out
