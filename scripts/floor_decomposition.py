"""Per-query decomposition of Spark wall time into fixed scheduling
floor vs data-proportional work.

The 2x-of-DuckDB gate (BASELINE.md) is failed at sf0.1 almost entirely
by queries whose ORACLE runs in 5-250 ms: DuckDB answers in-process
while Spark pays a fixed per-query toll — Python-side plan build (py4j
round trips), job scheduling, AQE stage barriers — that is independent
of data size. This script MEASURES that claim per query instead of
asserting it per regime (round-5 verdict, next-round item 1):

- ``plan_build_s``: wall time of the registered fn() building the
  DataFrame (prepared-plan memo disabled) — pure driver/py4j, zero jobs.
- ``exec_s``: wall time of one WARM execution (write.format("noop")).
- ``n_jobs``: Spark jobs the execution schedules.
- ``job_time_s``: sum of in-job (submission -> completion) time across
  those jobs — the part that scales with data and executors.
- ``sched_gap_s``: exec_s - job_time_s — driver-side planning/AQE
  stage-barrier time BETWEEN jobs; pure floor, does not grow with data.
- streaming queries instead carry the drain's own durationMs breakdown
  (addBatch = the one data-proportional term; queryPlanning, walCommit,
  commitOffsets, start/stop are machinery).

Writes FLOOR_DECOMP.json at the repo root; scripts/oracle_bench.py
merges it per-query into ORACLE_BENCH.json so every over-gate row
carries its measured fixed-cost decomposition.

Usage:
    python scripts/floor_decomposition.py [sf_dir] [q_name ...]
    (no names => every registered query)
"""

from __future__ import annotations

import json
import sys
import time
import os
import urllib.request
from datetime import datetime
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _jobs(ui: str, app: str) -> dict[int, float]:
    out = {}
    fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
    for j in json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs")
    ):
        try:
            dt = (
                datetime.strptime(j["completionTime"], fmt)
                - datetime.strptime(j["submissionTime"], fmt)
            ).total_seconds()
        except (KeyError, ValueError):
            dt = 0.0
        out[j["jobId"]] = dt
    return out


def main() -> None:
    args = sys.argv[1:]
    out_name = next(
        (a for a in args if a.endswith(".json")), "FLOOR_DECOMP.json"
    )
    sf_dir = next(
        (a for a in args if not a.startswith("q_") and not a.endswith(".json")),
        "/root/testdata/sf0.1",
    )
    names = [a for a in args if a.startswith("q_")]

    from pyspark.sql import SparkSession

    import open_rust_timeseries_db_spark.queries.registry as registry
    from bench import warmup_session
    from open_rust_timeseries_db_spark.queries import all_queries
    from open_rust_timeseries_db_spark.queries.cache_builds import cache_builders
    from open_rust_timeseries_db_spark.session import tune_session
    from open_rust_timeseries_db_spark.streaming import run as stream_run

    # bench.py's session shape (volume-sized shuffle partitions), with
    # the UI on so per-job durations are readable over REST.
    raw_bytes = sum(f.stat().st_size for f in Path(sf_dir).glob("*.parquet"))
    sp = max(8, min(128, int(raw_bytes * 8 / (64 << 20)) or 1))
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("floor-decomp")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.ui.enabled", "true")
        # Same driver heap as session.get_spark — the default 1g OOMs
        # at the sf1 tier (static conf, must precede JVM start).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        )
        .getOrCreate()
    )
    tune_session(spark)
    # Volume-gated scan splits, mirroring bench.py (see the comment
    # there: single-row-group sf0.1 files make finer splits pure
    # scheduling overhead, so the gate only opens at sf1-scale).
    import os as _os

    mpb = max(4 << 20, int(raw_bytes / (2 * (_os.cpu_count() or 8))))
    if raw_bytes * 8 >= (256 << 20) and mpb < (128 << 20):
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
        spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 19))
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", str(mpb)
        )
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    warmup_session(spark, sf_dir)
    for build in cache_builders(spark, sf_dir).values():
        build()

    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    registry.PLAN_MEMO_ENABLED = False
    out: dict[str, dict] = {}
    for name, spec in sorted(specs.items()):
        if names and name not in names:
            continue
        if "streaming" in spec.tags:
            # Warm pass, then measure one drain + its progress metrics.
            spec.fn(spark, sf_dir)
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir)
            wall = time.perf_counter() - t0
            prog = stream_run.LAST_DRAIN_PROGRESS
            dur = prog[0]["durationMs"] if prog else {}
            add_batch = float(dur.get("addBatch", 0)) / 1e3
            out[name] = {
                "kind": "streaming_drain",
                "wall_s": round(wall, 4),
                "add_batch_s": round(add_batch, 4),
                "machinery_s": round(wall - add_batch, 4),
                "duration_ms": dur,
            }
        else:
            # Warm once (codegen, session caches), then attribute.
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            before = set(_jobs(ui, app))
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            after = _jobs(ui, app)
            new = {j: d for j, d in after.items() if j not in before}
            job_time = sum(new.values())
            out[name] = {
                "kind": "batch",
                "plan_build_s": round(t1 - t0, 4),
                "exec_s": round(t2 - t1, 4),
                "n_jobs": len(new),
                "job_time_s": round(job_time, 4),
                "sched_gap_s": round(max(0.0, (t2 - t1) - job_time), 4),
            }
        print(name, out[name]["kind"],
              {k: v for k, v in out[name].items() if k not in ("kind", "duration_ms")},
              flush=True)

    path = REPO / out_name
    path.write_text(json.dumps({
        "sf_dir": sf_dir,
        "policy": (
            "warm-execution attribution in a bench-warmed session after "
            "the cache-build phase; plan_build_s is py4j-only (no jobs); "
            "sched_gap_s = wall - sum(per-job durations) = driver/AQE "
            "barrier floor; streaming rows carry the drain durationMs "
            "(addBatch is the data term)."
        ),
        "queries": out,
    }, indent=1, sort_keys=True))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
