"""Adversarial-ordering study (the CarefulAttack/AdversarialAttack family,
SURVEY.md §2.3 #32 — reference CarefulAttack.java / AdversarialAttackTest):
t-digest accuracy genuinely depends on input order; this driver measures the
worst observed cdf error for hostile orderings vs shuffled input, per scale
function.

Orderings:
* shuffled     — the i.i.d. baseline
* sorted       — globally ascending (the classic hard case)
* sawtooth     — interleaved ascending runs (defeats buffer-local mixing)
* zoomin       — exponentially shrinking values toward 0 appended last
                 (concentrates merge pressure on one tail centroid, the
                 CarefulAttack target region, CarefulAttack.java:31-48)

    python scripts/adversarial_attack.py --n 131072 --compression 100

Output: one line per (scale, ordering): max |cdf err| over 201 probes. This
is a study driver (the reference uses it to SHOW attacks work); the pytest
layer asserts only the documented safe cases.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def orderings(n: int, seed: int) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.0, 1.0, n)
    s = np.sort(base)
    saw = s.reshape(64, -1).T.reshape(-1)  # 64 interleaved ascending runs
    zoom = np.concatenate([rng.uniform(0.5, 1.0, n // 2),
                           0.5 ** np.arange(2, 2 + n // 2)])
    return {"shuffled": base, "sorted": s, "sawtooth": saw, "zoomin": zoom}


def max_cdf_error(data: np.ndarray, scale: str, compression: float,
                  buffer_chunk: int) -> float:
    from t_digest_ray.state.tdigest import TDigest

    d = TDigest(compression, scale)
    for i in range(0, len(data), buffer_chunk):
        d.update_batch(data[i:i + buffer_chunk])
    d.compress()
    s = np.sort(data)
    probes = s[np.linspace(0, len(s) - 1, 201).astype(np.int64)]
    est = d.cdf_batch(probes)
    lo = np.searchsorted(s, probes, side="left") / len(s)
    hi = np.searchsorted(s, probes, side="right") / len(s)
    err = np.where(est < lo, est - lo, np.where(est > hi, est - hi, 0.0))
    return float(np.abs(err).max())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 17)
    ap.add_argument("--compression", type=float, default=100.0)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--scales", nargs="+", default=["K_0", "K_1", "K_2"])
    args = ap.parse_args()

    results: dict[str, dict[str, float]] = {}
    print("scale,ordering,max_cdf_err")
    for scale in args.scales:
        results[scale] = {}
        for name, data in orderings(args.n, args.seed).items():
            e = max_cdf_error(data, scale, args.compression, args.chunk)
            results[scale][name] = round(e, 5)
            print(f"{scale},{name},{e:.5f}")
    print(json.dumps({"metric": "worst-case cdf error by input ordering",
                      "n": args.n, "compression": args.compression,
                      "results": results}))


if __name__ == "__main__":
    main()
