"""Benchmark harness (the SpeedComparison-equivalent, SURVEY.md §2.3 #35).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "rows_per_sec": {...}}

``--scaling`` runs the same bench in two fresh processes at
RAY_GRAFT_CPUS=8 and =32 and reports both plus scaling efficiency
(the sandbox stand-in for the N vs 4N node cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# rows each benched pipeline consumes (for rows/s reporting)
PAGES_ROWS = 400_000


def _bench_queries():
    """name -> (callable(sf_dir) -> Dataset, input_rows or None)."""
    import __ray_entry__ as e
    from t_digest_ray.pipelines.quantiles import quantiles_by_key, pages_quantiles
    from t_digest_ray.sources.pages import synthetic_pages

    def lineitem_digest(sf):
        import ray.data as rd
        ds = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_returnflag", "l_extendedprice"])
        return quantiles_by_key(ds, "l_extendedprice", "l_returnflag",
                                num_salts=8)

    def pages_pipeline(sf):
        n = PAGES_ROWS if sf == SF_DIR else 2_000  # tiny during warmup
        # blocks ~ CPU count: per-task scheduling overhead dominates tiny
        # blocks; at real scale blocks are sized by target_max_block_size
        pages = synthetic_pages(n, parallelism=NUM_CPUS)
        return pages_quantiles(pages, value_cols=("text_length", "html_size"),
                               key="lang", num_salts=8)["html_size"]

    return {
        "lineitem_digest": (lineitem_digest, None),
        "pages_flagship": (pages_pipeline, PAGES_ROWS),
        "q1_pricing_summary": (e.q1_pricing_summary, None),
        "tdigest_events_value": (e.tdigest_events_value, None),
        "exact_dedup_text": (e.exact_dedup_text, None),
    }


def run_bench() -> dict:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    # warm the page cache so we measure compute + shuffle, not first disk read
    import pyarrow.parquet as pq
    for t in ["lineitem", "events", "documents"]:
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    queries = _bench_queries()

    # warm the Ray worker pool + per-worker imports with untimed tiny runs
    # (first pipeline otherwise absorbs ~tens of seconds of process spin-up)
    for name, (fn, _) in queries.items():
        try:
            fn("/root/testdata/sf0.001").count()
        except Exception:  # noqa: BLE001 - warmup is best-effort
            pass

    timings: dict[str, float] = {}
    rows_per_sec: dict[str, float] = {}
    for name, (fn, n_rows) in queries.items():
        t0 = time.perf_counter()
        ds = fn(SF_DIR)
        n = ds.count()  # consume the pipeline
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        if n_rows:
            rows_per_sec[name] = round(n_rows / dt)
        assert n > 0, f"{name} returned no rows"
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline pipelines wall time (sketch build + merge + query)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows_per_sec": rows_per_sec,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling efficiency (same input, fresh ray.init at 8 vs 32 CPUs)",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "queries_8": r_lo["queries"],
        "queries_32": r_hi["queries"],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
