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
PAGES_ROWS = 2_000_000


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
        # block size is a function of the DATA, not the CPU count (as on a
        # real cluster, where target_max_block_size fixes it): ~16k rows
        # (~25 MB of html) per block keeps per-batch buffers small enough
        # for the allocator to recycle, and gives every CPU level the same
        # work units to schedule
        pages = synthetic_pages(PAGES_ROWS,
                                parallelism=max(PAGES_ROWS // 16_384, 1))
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

    # JMH-style warmup (the reference measures after 3x3s warmup rounds,
    # TDigestBench.java:21-27): one untimed FULL-SIZE run per query spawns
    # the worker pool and faults in worker heaps / object-store pages —
    # in this container a cold first-touch page costs ~1000x a warm one,
    # which would otherwise dominate every timing.
    cold: dict[str, float] = {}
    for name, (fn, _) in queries.items():
        t0 = time.perf_counter()
        fn(SF_DIR).count()
        cold[name] = round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    rows_per_sec: dict[str, float] = {}
    for name, (fn, n_rows) in queries.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            ds = fn(SF_DIR)
            n = ds.count()  # consume the pipeline
            best = min(best, time.perf_counter() - t0)
            assert n > 0, f"{name} returned no rows"
        timings[name] = round(best, 3)
        if n_rows:
            rows_per_sec[name] = round(n_rows / best)
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline pipelines wall time (sketch build + merge + query)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold_first_run": cold,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows_per_sec": rows_per_sec,
    }
    ray.shutdown()
    return result


def run_flagship_only() -> dict:
    """Time ONLY the flagship pages pipeline (the headline job of the
    north_star): full-size warmup, then best-of-2. Invoked in a fresh
    process per CPU level by --scaling."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from t_digest_ray.pipelines.quantiles import pages_quantiles
    from t_digest_ray.sources.pages import synthetic_pages

    def run():
        # same fixed ~16k-row blocks at every CPU level (see pages_pipeline)
        pages = synthetic_pages(PAGES_ROWS,
                                parallelism=max(PAGES_ROWS // 16_384, 1))
        pages_quantiles(pages, value_cols=("text_length", "html_size"),
                        key="lang", num_salts=8)["html_size"].count()

    run()  # fault in worker heaps (cold first-touch is ~1000x a warm page)
    t0 = time.perf_counter()
    run()
    sec = time.perf_counter() - t0
    ray.shutdown()
    return {"sec": round(sec, 3), "rows": PAGES_ROWS,
            "rows_per_sec": round(PAGES_ROWS / sec), "num_cpus": NUM_CPUS}


def run_scaling() -> dict:
    """The N-vs-4N criterion: the SAME flagship job in fresh processes at
    two parallelism levels; efficiency = throughput ratio / cpu ratio."""
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flagship-only"],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    # default 4 vs 16: on this single box DRAM bandwidth is shared across
    # all "nodes", so 32 concurrent cores saturate it (a single-node
    # artifact — real 4N clusters add DRAM with nodes); 4->16 keeps the
    # per-core memory bandwidth comparable between levels. Override with
    # GRAFT_SCALE_LEVELS=8,32 etc.
    lo, hi = (int(x) for x in
              os.environ.get("GRAFT_SCALE_LEVELS", "4,16").split(","))
    # machine-state drift between runs dwarfs the signal on this box, so
    # alternate the levels (hi, lo, hi, lo) and take the best per level —
    # each sample is its own fresh process with in-process warmup
    samples: dict[int, list] = {lo: [], hi: []}
    for level in (hi, lo, hi, lo):
        samples[level].append(run(level)["rows_per_sec"])
    rps_lo, rps_hi = max(samples[lo]), max(samples[hi])
    eff = (rps_hi / rps_lo) / (hi / lo)
    return {
        "metric": f"scaling efficiency (flagship pages pipeline, fresh "
                  f"ray.init at {lo} vs {hi} CPUs, same {PAGES_ROWS}-row "
                  f"input; best of 2 alternating fresh-process samples per "
                  f"level)",
        f"rows_per_sec_{lo}": rps_lo,
        f"rows_per_sec_{hi}": rps_hi,
        f"samples_{lo}": samples[lo],
        f"samples_{hi}": samples[hi],
        "scaling_efficiency": round(eff, 3),
        "rows": PAGES_ROWS,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--flagship-only" in sys.argv:
        print(json.dumps(run_flagship_only()))
    else:
        print(json.dumps(run_bench()))
