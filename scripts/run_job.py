"""Config-driven job entry point (``ray job submit`` target).

    python scripts/run_job.py job.json
    ray job submit -- python scripts/run_job.py job.json

Reads a JSON JobConfig (see t_digest_ray/config.py), runs the pipeline,
writes parquet if ``output`` is set, and prints one JSON summary line.
Guarded ray.init: under ``ray job submit`` the cluster connection already
exists.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    metrics_path = None
    if "--metrics" in args:
        i = args.index("--metrics")
        metrics_path = args[i + 1]
        del args[i:i + 2]
    if len(args) != 1:
        sys.exit("usage: run_job.py <config.json> [--metrics out.json]")
    from t_digest_ray.config import JobConfig, run_job

    cfg = JobConfig.from_file(args[0])

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.perf_counter()
    out = run_job(cfg)
    if metrics_path:
        import pandas as pd
        if not isinstance(out, pd.DataFrame):
            out = out.materialize()  # stats() needs an executed dataset
    n = out.count() if not hasattr(out, "shape") else len(out)
    summary = {
        "pipeline": cfg.pipeline,
        "input": cfg.input,
        "rows_out": n,
        "output": cfg.output,
        "sec": round(time.perf_counter() - t0, 3),
    }
    if metrics_path:
        # per-stage execution metrics (ray.data stats: wall/cpu/rows/
        # object-store bytes per operator) alongside the summary — the
        # job-level metrics surface next to the checkpoint module's
        # per-partition lineage
        with open(metrics_path, "w") as f:
            json.dump({**summary,
                       "stats": (out.stats()
                                 if hasattr(out, "stats") else None)},
                      f, indent=2)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
