"""Cuckoo filter: approximate set membership WITH DELETION.

Built from the published construction (Fan, Andersen, Kaminsky,
Mitzenmacher: "Cuckoo Filter: Practically Better Than Bloom", CoNEXT
2014). Not in the reference repo — it extends the graft's membership
family (state/bloom.py) with the one operation a Bloom filter cannot
do: removing a key (the retract path of incremental dedup).

* ``m`` buckets (power of two) x ``SLOTS=4`` slots of 16-bit
  fingerprints (0 = empty, fingerprints forced nonzero). 16 bits (not
  the paper's illustrative 8) so that distinct keys colliding on the
  same (bucket-pair, fingerprint) entry — which under set semantics
  would turn a delete of one into a false negative for the other —
  stay negligible at fleet scale.
* partial-key cuckoo hashing: an item's two candidate buckets are
  ``i1 = H(x) & (m-1)`` and ``i2 = i1 ^ (H'(fp) & (m-1))`` — the alt
  bucket is recoverable from (bucket, fp) alone, which is what makes
  eviction and MERGE possible without the original keys.
* SET semantics: each distinct (canonical bucket pair, fingerprint)
  entry is stored at most once, so ``delete`` removes the key outright
  and re-inserting is idempotent. The occupancy answer (and therefore
  ``contains``) depends only on the SET of entries — insertion order,
  batch boundaries and merge order cannot change results unless the
  table overflows (``overflowed`` flips and stays sticky; size so the
  load factor stays under ~0.84, the 4-slot threshold from §5 of the
  paper).
* no false negatives for present keys (up to the entry-collision
  caveat above); false-positive rate is bounded by
  ``2 * SLOTS / (2**16 - 1)`` per probe (~0.012%).
* merge = union of entries (associative, commutative, idempotent).

Bulk insertion is vectorized: a rank-within-bucket pass places rows
into i1, a second pass into i2's spare capacity, and only the tiny
residue (nonexistent until high load) walks the classic kick loop.
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.hashing import hash64, splitmix64

SLOTS = 4
_MAX_KICKS = 500
_HEADER_FMT = "<4sqqb"  # magic, m_buckets, n_items, overflowed


class CuckooFilter:
    def __init__(self, n_buckets: int = 1 << 16):
        m = 1 << max(int(n_buckets) - 1, 1).bit_length()
        self.m = m
        self.table = np.zeros((m, SLOTS), dtype=np.uint16)
        self.n_items = 0          # occupied slots
        self.overflowed = False

    @classmethod
    def from_capacity(cls, n_items: int,
                      load: float = 0.7) -> "CuckooFilter":
        return cls(max(int(n_items / (SLOTS * load)), 2))

    # -- hashing -----------------------------------------------------
    def _fp_i1(self, values):
        h = hash64(np.asarray(values))
        fp = ((h >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        i1 = (h & np.uint64(self.m - 1)).astype(np.int64)
        return fp, i1

    def _alt(self, bucket: np.ndarray, fp: np.ndarray) -> np.ndarray:
        off = splitmix64(fp.astype(np.uint64) + np.uint64(0x9E37)) \
            & np.uint64(self.m - 1)
        return (bucket.astype(np.uint64) ^ off).astype(np.int64)

    def _canon(self, bucket, fp):
        """Canonical (smaller) bucket of the pair — the set-entry id."""
        alt = self._alt(bucket, fp)
        return np.minimum(bucket, alt), np.maximum(bucket, alt)

    # -- core set ops ------------------------------------------------
    def _present_mask(self, b1, b2, fp) -> np.ndarray:
        row1 = self.table[b1]                      # (n, SLOTS)
        row2 = self.table[b2]
        f = fp[:, None]
        return ((row1 == f).any(axis=1)) | ((row2 == f).any(axis=1))

    def update_batch(self, values, weights=None) -> None:
        arr = np.asarray(values)
        if arr.size == 0:
            return
        fp, i1 = self._fp_i1(arr)
        lo, hi = self._canon(i1, fp)
        # set semantics: one entry per distinct (lo, hi, fp)
        ent = np.unique(np.stack([lo, hi, fp.astype(np.int64)], axis=1),
                        axis=0)
        lo, hi, fp = ent[:, 0], ent[:, 1], ent[:, 2].astype(np.uint16)
        keep = ~self._present_mask(lo, hi, fp)
        lo, hi, fp = lo[keep], hi[keep], fp[keep]
        if not len(fp):
            return
        residue = self._bulk_place(lo, fp)
        if residue is not None:
            lo2, fp2 = residue
            hi2 = self._alt(lo2, fp2)
            res2 = self._bulk_place(hi2, fp2)
            if res2 is not None:
                for b, f in zip(self._alt(res2[0], res2[1]), res2[1]):
                    self._kick_insert(int(b), int(f))

    add_batch = update_batch

    def _bulk_place(self, buckets, fps):
        """Place (bucket, fp) pairs into free slots of their bucket,
        vectorized via rank-within-bucket; returns the unplaced residue
        or None."""
        order = np.argsort(buckets, kind="stable")
        b, f = buckets[order], fps[order]
        starts = np.concatenate([[True], b[1:] != b[:-1]])
        grp_start_idx = np.flatnonzero(starts)
        rank = np.arange(len(b)) - np.repeat(grp_start_idx,
                                             np.diff(np.concatenate(
                                                 [grp_start_idx,
                                                  [len(b)]])))
        free = (self.table[b] == 0)               # (n, SLOTS)
        n_free = free.cumsum(axis=1)
        # slot for rank r = index of the (r+1)-th free slot, if any
        slot = (n_free == (rank + 1)[:, None]).argmax(axis=1)
        fits = (rank + 1)[:] <= free.sum(axis=1)
        # only ranks that fit get written; rely on per-bucket grouping
        self.table[b[fits], slot[fits]] = f[fits]
        self.n_items += int(fits.sum())
        if fits.all():
            return None
        return b[~fits], f[~fits]

    def _kick_insert(self, bucket: int, fp: int) -> None:
        """Classic cuckoo eviction walk (deterministic victim choice)."""
        cur_b, cur_f = bucket, fp
        for kick in range(_MAX_KICKS):
            row = self.table[cur_b]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                self.table[cur_b, empty[0]] = cur_f
                self.n_items += 1
                return
            victim = kick % SLOTS
            vf = int(self.table[cur_b, victim])
            self.table[cur_b, victim] = cur_f
            cur_f = vf
            cur_b = int(self._alt(np.array([cur_b]),
                                  np.array([cur_f],
                                           dtype=np.uint16))[0])
        self.overflowed = True

    def delete_batch(self, values) -> int:
        """Remove present keys (set semantics: the key's single entry).
        Returns the number of entries removed."""
        arr = np.asarray(values)
        if arr.size == 0:
            return 0
        fp, i1 = self._fp_i1(arr)
        lo, hi = self._canon(i1, fp)
        ent = np.unique(np.stack([lo, hi, fp.astype(np.int64)], axis=1),
                        axis=0)
        removed = 0
        for l, h, f in ent:                        # tiny: unique keys
            for b in (l, h):
                hits = np.flatnonzero(self.table[b] == f)
                if len(hits):
                    self.table[b, hits[0]] = 0
                    self.n_items -= 1
                    removed += 1
                    break
        return removed

    def contains(self, values) -> np.ndarray:
        arr = np.atleast_1d(np.asarray(values))
        if arr.size == 0:
            return np.empty(0, dtype=bool)
        fp, i1 = self._fp_i1(arr)
        i2 = self._alt(i1, fp)
        return self._present_mask(i1, i2, fp)

    # -- merge / serde -----------------------------------------------
    def entries(self):
        """All stored (canonical bucket, fp) pairs."""
        b, s = np.nonzero(self.table)
        fp = self.table[b, s]
        lo, _ = self._canon(b.astype(np.int64), fp)
        return lo, fp

    def merge(self, *others: "CuckooFilter") -> "CuckooFilter":
        for o in others:
            if o.m != self.m:
                raise ValueError("Cannot merge cuckoo filters of "
                                 "different sizes")
            self.overflowed |= o.overflowed
            lo, fp = o.entries()
            if not len(fp):
                continue
            hi = self._alt(lo, fp)
            keep = ~self._present_mask(lo, hi, fp)
            if keep.any():
                residue = self._bulk_place(lo[keep], fp[keep])
                if residue is not None:
                    r2 = self._bulk_place(self._alt(*residue),
                                          residue[1])
                    if r2 is not None:
                        for b, f in zip(self._alt(*r2), r2[1]):
                            self._kick_insert(int(b), int(f))
        return self

    def load_factor(self) -> float:
        return self.n_items / float(self.m * SLOTS)

    def fp_rate_bound(self) -> float:
        """Upper bound on the per-probe false-positive rate: 2 buckets x
        SLOTS slots x P(fp collision) with 65535 nonzero prints."""
        return 2.0 * SLOTS / 65535.0

    def to_bytes(self) -> bytes:
        head = struct.pack(_HEADER_FMT, b"CKF1", self.m, self.n_items,
                           int(self.overflowed))
        return head + self.table.astype("<u2").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CuckooFilter":
        magic, m, n_items, ovf = struct.unpack_from(_HEADER_FMT, buf, 0)
        if magic != b"CKF1":
            raise ValueError(f"bad cuckoo magic {magic!r}")
        c = cls.__new__(cls)
        c.m = m
        c.table = np.frombuffer(
            buf, dtype="<u2",
            offset=struct.calcsize(_HEADER_FMT)).astype(
            np.uint16).reshape(m, SLOTS)
        c.n_items = n_items
        c.overflowed = bool(ovf)
        return c
