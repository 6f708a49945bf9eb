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
    if len(sys.argv) != 2:
        sys.exit("usage: run_job.py <config.json>")
    from t_digest_ray.config import JobConfig, run_job

    cfg = JobConfig.from_file(sys.argv[1])

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.perf_counter()
    out = run_job(cfg)
    n = out.count()
    print(json.dumps({
        "pipeline": cfg.pipeline,
        "input": cfg.input,
        "rows_out": n,
        "output": cfg.output,
        "sec": round(time.perf_counter() - t0, 3),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
