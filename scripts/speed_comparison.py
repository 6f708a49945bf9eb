"""SpeedComparison port (SURVEY.md §2.3 #35; SpeedComparison.java:51-166):
single-thread ns/update for each sketch across N = 2^LgNmin..2^LgNmax.

    python scripts/speed_comparison.py --lgn-min 17 --lgn-max 21

Prints one CSV-ish line per (structure, lgN) plus a JSON summary, mirroring
the reference's ns/update tables (single thread by design — it's a timing
study of the update kernels, not of the distributed engine; bench.py covers
that).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lgn-min", type=int, default=17)
    ap.add_argument("--lgn-max", type=int, default=21)
    ap.add_argument("--compression", type=float, default=500)
    ap.add_argument("--kll-k", type=int, default=100)
    ap.add_argument("--req-k", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=65536)
    args = ap.parse_args()

    from t_digest_ray.state.kll import KllSketch
    from t_digest_ray.state.req import ReqSketch
    from t_digest_ray.state.tdigest import TDigest

    makers = {
        "merging": lambda: TDigest(args.compression),
        "kll": lambda: KllSketch(args.kll_k),
        "req": lambda: ReqSketch(args.req_k),
    }

    rng = np.random.default_rng(42)
    summary: dict[str, dict[int, float]] = {k: {} for k in makers}
    print("structure,lgN,ns_per_update,updates_per_sec")
    for lg in range(args.lgn_min, args.lgn_max + 1):
        n = 1 << lg
        data = rng.uniform(0.0, 1.0, n)
        for name, mk in makers.items():
            sk = mk()
            sk.update_batch(data[:4096])  # warm
            sk = mk()
            t0 = time.perf_counter()
            for i in range(0, n, args.chunk):
                sk.update_batch(data[i:i + args.chunk])
            dt = time.perf_counter() - t0
            ns = dt / n * 1e9
            summary[name][lg] = round(ns, 2)
            print(f"{name},{lg},{ns:.2f},{n / dt:,.0f}")
    print(json.dumps({"metric": "ns/update by structure and lgN",
                      "config": vars(args), "results": summary}))


if __name__ == "__main__":
    main()
