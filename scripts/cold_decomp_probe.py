"""COLD-pass decomposition: where does a query's FIRST invocation go?

bench.py's per-query cold is pass 1 in a warmed session after the
cache-build phase. For each named query this script reproduces that
state exactly (same confs, warmups, builds), then splits the first
invocation into:

  plan_build_s  - fn() build wall (py4j only, no jobs)
  exec_s        - first noop execution wall
  n_jobs        - jobs scheduled by the execution
  job_time_s    - sum of in-job durations (UI REST)
  sched_gap_s   - exec_s - job_time_s (driver/AQE/codegen-compile floor)

and then times a second (warm) pass the same way. The cold-vs-warm
delta per bucket names the one-time cost: jobs (data/compile inside
tasks), gap (driver-side stage planning/janino), or plan build.

Usage: python scripts/cold_decomp_probe.py [sf_dir] q_a q_b ...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _jobs(ui: str, app: str) -> dict[int, float]:
    out = {}
    fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
    from datetime import datetime

    for j in json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs")
    ):
        if "completionTime" not in j:
            continue
        t0 = datetime.strptime(j["submissionTime"], fmt)
        t1 = datetime.strptime(j["completionTime"], fmt)
        out[j["jobId"]] = (t1 - t0).total_seconds()
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = next(
        (a for a in args if not a.startswith("q_")), "/root/testdata/sf0.1"
    )
    names = [a for a in args if a.startswith("q_")]

    from pyspark.sql import SparkSession

    from bench import warmup_session
    from open_rust_timeseries_db_spark.queries import all_queries
    from open_rust_timeseries_db_spark.queries.cache_builds import (
        cache_builders,
    )
    from open_rust_timeseries_db_spark.session import tune_session

    raw_bytes = sum(f.stat().st_size for f in Path(sf_dir).glob("*.parquet"))
    n_cores = os.cpu_count() or 8
    sp = max(8, min(4 * n_cores, int(raw_bytes * 8 / (64 << 20)) or 1))
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("cold-decomp")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.ui.enabled", "true")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        )
        .getOrCreate()
    )
    tune_session(spark)
    if raw_bytes * 8 < (256 << 20):
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    warmup_session(spark, sf_dir)
    for build in cache_builders(spark, sf_dir).values():
        build()

    ui = spark.sparkContext.uiWebUrl
    app = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications")
    )[0]["id"]

    out: dict[str, dict] = {}
    for name in names:
        spec = specs[name]
        row: dict[str, dict] = {}
        for pass_i in ("cold", "warm"):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            before = set(_jobs(ui, app))
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            after = _jobs(ui, app)
            new = {j: d for j, d in after.items() if j not in before}
            job_time = sum(new.values())
            row[pass_i] = {
                "plan_build_s": round(t1 - t0, 4),
                "exec_s": round(t2 - t1, 4),
                "n_jobs": len(new),
                "job_time_s": round(job_time, 4),
                "sched_gap_s": round(max(0.0, (t2 - t1) - job_time), 4),
            }
        out[name] = row
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
