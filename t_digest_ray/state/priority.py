"""Priority sampling — mergeable weighted sample with unbiased
subset-sum estimates (Duffield, Lund & Thorup, "Priority sampling for
estimation of arbitrary subset sums", JACM 2007; variance near-optimality
per Szegedy 2006).

Not in the reference repo — it extends the sampler family (stratified /
Bernoulli / weighted / mixture, pipelines/curation.py) with the estimator
those lack: from ONE k-item sample, an unbiased estimate of the total
weight of ANY predicate-defined subset of keys, with variance no worse
than the best possible k-1-item scheme:

* item i gets priority ``q_i = w_i / u_i`` with ``u_i`` uniform in (0,1];
  the sketch keeps the k+1 highest-priority items; ``tau`` = the
  (k+1)-th priority; every kept item estimates its weight as
  ``max(w_i, tau)``; dropped items estimate 0.  E[estimate] = w_i.
* **Determinism / layout-invariance**: u_i is splitmix64-derived from
  the KEY (functions/hashing.py), not an RNG — the same key draws the
  same uniform in every partition, every retry, every parallelism.
* **Merge contract**: merging is the exact union-top-(k+1) BY PRIORITY,
  which equals the single-machine sketch whenever each key's total
  weight lands in exactly one input (disjoint key sets — guaranteed by
  the hash-bucketed pre-aggregation the pipeline performs). Same-key
  collisions are still handled (weights add, priority recomputed) so
  the merge is total, but the unbiasedness proof assumes disjointness;
  the pipeline documents and enforces it.

The per-batch cost is one vectorized hash + one argpartition; the sketch
row is O(k) — KB-sized on the shuffle like every other sketch here.
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.hashing import hash64

_HDR_FMT = "<4sqq"  # magic, k, n_items_kept
_HDR_SIZE = struct.calcsize(_HDR_FMT)

# map uint64 hash -> uniform in (0, 1]: (h + 1) / 2^64
_U64 = float(2 ** 64)


def key_uniforms(keys) -> np.ndarray:
    """Deterministic per-key uniforms in (0, 1] from splitmix64."""
    h = hash64(np.asarray(keys))
    return (h.astype(np.float64) + 1.0) / _U64


class PrioritySample:
    """Top-(k+1)-priority weighted sample over (key, weight) items.

    Keys are canonicalized to ``str`` at update time (the byte encoding
    stores them as NUL-joined text), so the per-key uniform, duplicate
    collapse and downstream subset predicates all see one stable type.
    """

    def __init__(self, k: int = 256):
        if k < 2:
            raise ValueError(f"k must be >= 2, got {k}")
        self.k = int(k)
        self.keys = np.empty(0, dtype=object)
        self.weights = np.empty(0, dtype=np.float64)
        self.unif = np.empty(0, dtype=np.float64)

    # ------------------------------------------------------------- update

    def _combine(self, keys, weights, unif) -> None:
        """Fold (key, weight, u) triples in: add weights of repeated keys,
        recompute priorities, keep the top k+1."""
        if len(self.keys):
            keys = np.concatenate([self.keys, keys])
            weights = np.concatenate([self.weights, weights])
            unif = np.concatenate([self.unif, unif])
        # collapse duplicate keys (same key ⇒ same u): weights add
        order = np.argsort(keys, kind="stable")
        keys, weights, unif = keys[order], weights[order], unif[order]
        if len(keys) > 1:
            new_grp = np.empty(len(keys), dtype=bool)
            new_grp[0] = True
            new_grp[1:] = keys[1:] != keys[:-1]
            idx = np.flatnonzero(new_grp)
            sums = np.add.reduceat(weights, idx)
            keys, weights, unif = keys[idx], sums, unif[idx]
        prio = weights / unif
        keep = min(self.k + 1, len(keys))
        if len(keys) > keep:
            top = np.argpartition(-prio, keep - 1)[:keep]
            keys, weights, unif = keys[top], weights[top], unif[top]
        self.keys, self.weights, self.unif = keys, weights, unif

    def update_batch(self, values, weights=None) -> None:
        """``values``: key array (one entry per item; repeated keys have
        their weights summed). ``weights`` defaults to 1 per item."""
        keys = np.asarray(values, dtype=object)
        if keys.size == 0:
            return
        if len(keys) and not isinstance(keys[0], str):
            keys = np.array([str(k) for k in keys], dtype=object)
        w = (np.ones(len(keys)) if weights is None
             else np.asarray(weights, dtype=np.float64))
        self._combine(keys, w, key_uniforms(keys))

    def merge(self, *others: "PrioritySample") -> "PrioritySample":
        for o in others:
            if o.k != self.k:
                raise ValueError(f"cannot merge k={o.k} into k={self.k}")
            if len(o.keys):
                self._combine(o.keys, o.weights, o.unif)
        return self

    # ------------------------------------------------------------ queries

    def _tau_and_sample(self) -> tuple[float, np.ndarray]:
        """Threshold tau (the (k+1)-th priority, 0 if under-full) and the
        indices of the k sample items, priority-descending."""
        prio = self.weights / self.unif
        order = np.argsort(-prio, kind="stable")
        if len(order) <= self.k:
            return 0.0, order
        return float(prio[order[self.k]]), order[:self.k]

    def sample(self) -> tuple[np.ndarray, np.ndarray]:
        """(keys, adjusted_weights) of the k-item sample: unbiased
        per-item weight estimates ``max(w_i, tau)``."""
        tau, idx = self._tau_and_sample()
        return self.keys[idx], np.maximum(self.weights[idx], tau)

    def subset_sum(self, mask_fn) -> float:
        """Unbiased estimate of ``sum of weights over keys where
        mask_fn(keys) is True`` (mask_fn: vectorized object-array
        predicate)."""
        keys, adj = self.sample()
        if len(keys) == 0:
            return 0.0
        m = np.asarray(mask_fn(keys), dtype=bool)
        return float(adj[m].sum())

    def total_estimate(self) -> float:
        """Unbiased estimate of the total weight."""
        _, adj = self.sample()
        return float(adj.sum())

    # ------------------------------------------------------------- serde

    def to_bytes(self) -> bytes:
        payload = "\x00".join(str(k) for k in self.keys).encode()
        return (struct.pack(_HDR_FMT, b"PRI1", self.k, len(self.keys))
                + struct.pack("<q", len(payload)) + payload
                + self.weights.astype("<f8").tobytes()
                + self.unif.astype("<f8").tobytes())

    @classmethod
    def from_bytes(cls, buf: bytes) -> "PrioritySample":
        magic, k, n = struct.unpack_from(_HDR_FMT, buf, 0)
        if magic != b"PRI1":
            raise ValueError(f"bad PrioritySample magic {magic!r}")
        out = cls(k)
        (plen,) = struct.unpack_from("<q", buf, _HDR_SIZE)
        off = _HDR_SIZE + 8
        if n:
            out.keys = np.array(
                buf[off:off + plen].decode().split("\x00"), dtype=object)
        off += plen
        out.weights = np.frombuffer(buf, dtype="<f8", count=n,
                                    offset=off).copy()
        out.unif = np.frombuffer(buf, dtype="<f8", count=n,
                                 offset=off + 8 * n).copy()
        return out
