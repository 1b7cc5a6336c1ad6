"""Probe: per-key exact percentile strategies at sf1 (round-10 task #4).

current  — groupBy(key,value) histogram + two windows per key
direct   — row_number window per key (oracle's plan; 5 single-task sorts)
binned   — per-key binned two-pass selection (every row pass parallel)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.session import get_spark
from open_rust_timeseries_db_spark.sources.catalog import load_table
from open_rust_timeseries_db_spark.operators.percentiles import (
    N_SELECTION_BINS,
    nearest_rank_percentiles_by,
    selection_bin,
)

SF = "/root/repo/testdata_sf1"
PCTS = [("p50", 0.50), ("p90", 0.90), ("p99", 0.99)]


def v_current(spark):
    ev = load_table(spark, SF, "events")
    return nearest_rank_percentiles_by(ev, "event_type", "value", PCTS, tiebreak="event_id")


def v_direct(spark):
    ev = load_table(spark, SF, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    aggs = []
    for name, p in PCTS:
        t = F.round(F.lit(p) * (F.col("__n") - 1)).cast("bigint") + 1
        aggs.append(F.max(F.when(F.col("rn") == t, F.col("value"))).alias(name))
    aggs.append(F.max("__n").cast("bigint").alias("n"))
    return r.groupBy("event_type").agg(*aggs)


def v_binned(spark):
    ev = load_table(spark, SF, "events").filter(F.col("value").isNotNull()).select(
        "event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("__lo"), F.max("value").alias("__hi"),
        F.count(F.lit(1)).alias("__n"))
    binned = ev.join(F.broadcast(stats), "event_type").select(
        "event_type", "value", "__n",
        selection_bin(F.col("value"), F.col("__lo"), F.col("__hi"),
                      N_SELECTION_BINS, is_float=True))
    hist = binned.groupBy("event_type", "__bin").agg(
        F.count(F.lit(1)).alias("__c"), F.max("__n").alias("__n2"))
    wcum = Window.partitionBy("event_type").orderBy("__bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = hist.select("event_type", "__bin", "__c",
                      F.sum("__c").over(wcum).alias("__cum"),
                      F.col("__n2").alias("__n"))
    arms = []
    for name, p in PCTS:
        r = F.round(F.lit(p) * (F.col("__n") - 1)).cast("bigint") + 1
        arms.append(F.when(
            (F.col("__cum") - F.col("__c") < r) & (r <= F.col("__cum")),
            F.struct(F.lit(name).alias("__name"), F.col("__bin").alias("__tbin"),
                     (r - (F.col("__cum") - F.col("__c"))).alias("__off"),
                     F.col("__n").alias("__tn"))))
    targets = (cum.select(F.col("event_type").alias("__tk"),
                          F.explode(F.array(*arms)).alias("__t"))
               .filter(F.col("__t").isNotNull()).select("__tk", "__t.*"))
    cand = binned.join(
        F.broadcast(targets),
        (binned["event_type"] == targets["__tk"]) & (binned["__bin"] == targets["__tbin"]),
    ).select(F.col("__tk").alias("k"), "value", "__name", "__off", "__tn")
    wsel = Window.partitionBy("k", "__name").orderBy("value")
    picked = (cand.select("k", "value", "__name", "__off", "__tn",
                          F.row_number().over(wsel).alias("__rn"))
              .filter(F.col("__rn") == F.col("__off")))
    return picked.groupBy(F.col("k").alias("event_type")).agg(
        *[F.max(F.when(F.col("__name") == name, F.col("value"))).alias(name)
          for name, _ in PCTS],
        F.max("__tn").cast("bigint").alias("n"))


def main():
    spark = get_spark("gpct", shuffle_partitions=23)
    spark.sparkContext.setLogLevel("ERROR")
    ref = {tuple(sorted(r.asDict().items())) for r in v_current(spark).collect()}
    for fn in (v_direct, v_binned):
        got = {tuple(sorted(r.asDict().items())) for r in fn(spark).collect()}
        assert got == ref, (fn.__name__, sorted(got)[:1], sorted(ref)[:1])
    for _ in range(2):
        for name, fn in (("current", v_current), ("direct", v_direct), ("binned", v_binned)):
            times = []
            for _ in range(3):
                t0 = time.perf_counter(); fn(spark).collect()
                times.append(time.perf_counter() - t0)
            print(name, [f"{t:.3f}" for t in times])


if __name__ == "__main__":
    main()
