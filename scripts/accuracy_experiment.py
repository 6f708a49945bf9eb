"""CLI accuracy experiment (IIDgenerator-equivalent, SURVEY.md §2.3 #33).

Runs T trials x N samples per distribution through tdigest/KLL/Req, collects
per-rank error envelopes into error-KLLs, writes one parquet per
distribution under --out and prints a summary table.

    python scripts/accuracy_experiment.py --dists uniform normal \
        --n 65536 --trials 16 --out /tmp/accuracy
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dists", nargs="+", default=["uniform", "normal",
                                                   "exponential",
                                                   "loguniform"])
    ap.add_argument("--n", type=int, default=1 << 16)
    ap.add_argument("--trials", type=int, default=16)
    ap.add_argument("--ranks", type=int, default=51)
    ap.add_argument("--compression", type=float, default=100.0)
    ap.add_argument("--out", default="/tmp/accuracy")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from t_digest_ray.pipelines.accuracy import accuracy_experiment

    os.makedirs(args.out, exist_ok=True)
    for dist in args.dists:
        df = accuracy_experiment(
            dist=dist, n=args.n, trials=args.trials, n_ranks=args.ranks,
            compression=args.compression).to_pandas()
        df = df.sort_values(["sketch", "rank"]).reset_index(drop=True)
        path = os.path.join(args.out, f"errors_{dist}.parquet")
        df.to_parquet(path)
        print(f"\n== {dist} (n={args.n}, trials={args.trials}) -> {path}")
        for sk, sub in df.groupby("sketch"):
            print(f"  {sk:8s} max|err|={sub['err_max'].abs().max():.5f} "
                  f"95%envelope=[{sub['err_lo'].min():+.5f},"
                  f"{sub['err_hi'].max():+.5f}]")
    ray.shutdown()


if __name__ == "__main__":
    main()
