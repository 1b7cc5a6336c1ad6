"""Host-speed canary: a FIXED workload, independent of the engine tree.

Rounds 10 and 11 ran on different boxes and the committed cold totals
swung 1.5-2x at identical code; the round-11 verdict (What's missing #2)
asked for a measurement instead of a prose claim. This script times five
pinned micro-workloads that exercise the axes our bench colds depend on
-- JVM start, parquet scan + hash agg, window sort, shuffle join, pure
JVM compute, and Python worker spin-up -- using ONLY pyspark and pinned
session confs (never the repo's session factory or query code), so the
identical script produces comparable numbers on any round's host.

Run it whenever the bench tiers are rolled; commit HOST_CANARY.json next
to them. Cross-round cold comparisons divide by the canary ratio before
anyone cries regression.

Usage: python scripts/host_canary.py [sf_dir] [n_rolls]
Writes: HOST_CANARY.json at the repo root (and prints it).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Pinned forever: changing any of these breaks cross-round comparability.
PINNED_CONFS = {
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Force the join workload to actually shuffle (customer at sf0.1 is
    # broadcast-sized; the canary wants exchange + sort-merge machinery).
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _host_fingerprint() -> dict:
    info: dict[str, object] = {"cores": os.cpu_count()}
    try:
        for line in Path("/proc/cpuinfo").read_text().splitlines():
            if line.lower().startswith("model name"):
                info["cpu_model"] = line.split(":", 1)[1].strip()
                break
        for line in Path("/proc/meminfo").read_text().splitlines():
            if line.startswith("MemTotal"):
                info["mem_total_kb"] = int(line.split()[1])
                break
    except OSError:
        pass
    return info


def _workloads(spark, sf_dir: str):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    def scan_agg():
        return (
            lineitem.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity"),
                F.avg("l_extendedprice"),
                F.count(F.lit(1)),
            )
        )

    def window_sort():
        w = W.partitionBy("user_id").orderBy("ts")
        return (
            events.select(
                "user_id",
                (F.col("value") - F.lag("value").over(w)).alias("d"),
                F.row_number().over(w).alias("rn"),
            )
            .groupBy("user_id")
            .agg(F.sum("d"), F.max("rn"))
        )

    def shuffle_join():
        return (
            orders.join(customer, orders.o_custkey == customer.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.sum("o_totalprice"), F.count(F.lit(1)))
        )

    def jvm_cpu():
        return spark.range(200_000_000).select(
            F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_003))).alias("h")
        )

    def python_workers():
        def _noop(batches):
            for pdf in batches:
                yield pdf

        return spark.range(64).repartition(32).mapInPandas(_noop, "id long")

    return {
        "scan_agg": scan_agg,
        "window_sort": window_sort,
        "shuffle_join": shuffle_join,
        "jvm_cpu": jvm_cpu,
        "python_workers": python_workers,
    }


def one_roll(sf_dir: str) -> dict:
    """Fresh JVM -> cold+warm per workload -> stop. Returns timings."""
    from pyspark.sql import SparkSession

    t0 = time.perf_counter()
    builder = SparkSession.builder.appName("host_canary").master("local[*]")
    for k, v in PINNED_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    jvm_start = round(time.perf_counter() - t0, 3)

    roll: dict[str, object] = {"jvm_start_sec": jvm_start}
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    loads = _workloads(spark, sf_dir)
    for name, build in loads.items():
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
    for name, build in loads.items():
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        warm[name] = round(time.perf_counter() - t0, 3)
    spark.stop()
    roll["cold"] = cold
    roll["warm"] = warm
    roll["cold_total"] = round(sum(cold.values()), 3)
    roll["warm_total"] = round(sum(warm.values()), 3)
    return roll


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_rolls = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rolls = [one_roll(sf_dir) for _ in range(n_rolls)]
    names = list(rolls[0]["cold"])  # type: ignore[index]
    result = {
        "policy": (
            "fixed tree-independent workload, pinned confs, fresh JVM "
            "per roll; medians over rolls. Compare cross-round cold "
            "totals only after dividing by this canary's ratio."
        ),
        "sf_dir": sf_dir,
        "host": _host_fingerprint(),
        "median_cold": {
            n: round(statistics.median(r["cold"][n] for r in rolls), 3)
            for n in names
        },
        "median_warm": {
            n: round(statistics.median(r["warm"][n] for r in rolls), 3)
            for n in names
        },
        "median_jvm_start_sec": round(
            statistics.median(r["jvm_start_sec"] for r in rolls), 3
        ),
        "median_cold_total": round(
            statistics.median(r["cold_total"] for r in rolls), 3
        ),
        "median_warm_total": round(
            statistics.median(r["warm_total"] for r in rolls), 3
        ),
        "rolls": rolls,
    }
    out = REPO / "HOST_CANARY.json"
    out.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps({k: result[k] for k in (
        "median_jvm_start_sec", "median_cold_total", "median_warm_total",
        "median_cold")}, separators=(",", ":")))


if __name__ == "__main__":
    main()
