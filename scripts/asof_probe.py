"""Probe: as-of strategies at sf1 (round-10 task #1).

Compares, on the q_asof_join / q_asof_forward shape (200k/200k from the
same events scan, 15k keys):
  window     — current shipped path (two scans + union + window)
  samesrc    — single-scan tagged union + same window
  mergeasof  — single-scan, repartition(key) + sortWithinPartitions(ts)
               + mapInPandas pd.merge_asof(by=key)
Prints per-variant cold (fresh plan, first run) and warm (second run)
wall seconds plus row counts for parity.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.session import get_spark
from open_rust_timeseries_db_spark.operators.asof import asof_join
from open_rust_timeseries_db_spark.queries.helpers import events_us

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"


def v_window(spark, direction):
    ev = events_us(spark, SF)
    if direction == "backward":
        left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts_us")
        right = ev.filter(F.col("event_type") == "click").select("user_id", "ts_us", "value")
    else:
        left = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts_us")
        right = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts_us", "value")
    return asof_join(left, right, on="user_id", left_ts="ts_us", right_ts="ts_us",
                     right_values=["value"], how="inner", direction=direction,
                     strategy="window")


def v_samesrc(spark, direction):
    ev = events_us(spark, SF)
    ltype, rtype = ("purchase", "click") if direction == "backward" else ("click", "purchase")
    tagged = ev.filter(F.col("event_type").isin(ltype, rtype)).select(
        F.col("user_id").alias("__key"),
        F.col("ts_us").alias("__ts"),
        F.when(F.col("event_type") == ltype, F.lit(1)).otherwise(F.lit(0)).alias("__tag"),
        "event_id",
        "value",
    )
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (Window.partitionBy("__key").orderBy(ts_order, F.col("__tag"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    rts = F.when(F.col("__tag") == 0, F.col("__ts"))
    rval = F.when(F.col("__tag") == 0, F.col("value"))
    out = tagged.select(
        "__key", "__ts", "__tag", "event_id",
        F.last(rts, ignorenulls=True).over(w).alias("asof_ts"),
        F.last(rval, ignorenulls=True).over(w).alias("asof_value"),
    ).filter((F.col("__tag") == 1) & F.col("asof_ts").isNotNull())
    return out.select(
        "event_id", F.col("__key").alias("user_id"), F.col("__ts").alias("ts_us"),
        "asof_ts", "asof_value")


def v_mergeasof(spark, direction):
    import pandas as pd

    ev = events_us(spark, SF)
    ltype, rtype = ("purchase", "click") if direction == "backward" else ("click", "purchase")
    tagged = ev.filter(F.col("event_type").isin(ltype, rtype)).select(
        F.col("user_id").alias("__key"),
        F.col("ts_us").alias("__ts"),
        (F.col("event_type") == ltype).alias("__is_left"),
        "event_id",
        "value",
    ).repartition(32, "__key").sortWithinPartitions("__key", "__ts")

    pdir = "backward" if direction == "backward" else "forward"

    def merge(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            lmask = pdf["__is_left"].values
            l = pdf.loc[lmask, ["__key", "__ts", "event_id"]].sort_values("__ts", kind="mergesort")
            r = pdf.loc[~lmask, ["__key", "__ts", "value"]].sort_values("__ts", kind="mergesort")
            r = r.rename(columns={"__ts": "asof_ts", "value": "asof_value"})
            m = pd.merge_asof(l, r, left_on="__ts", right_on="asof_ts",
                              by="__key", direction=pdir)
            m = m.dropna(subset=["asof_ts"])
            yield m.rename(columns={"__key": "user_id", "__ts": "ts_us"})[
                ["event_id", "user_id", "ts_us", "asof_ts", "asof_value"]]

    schema = "event_id long, user_id long, ts_us long, asof_ts long, asof_value double"
    return tagged.mapInPandas(merge, schema)


def run(name, fn, spark, direction):
    t0 = time.perf_counter()
    df = fn(spark, direction)
    n1 = df.count()
    t1 = time.perf_counter()
    df2 = fn(spark, direction)
    n2 = df2.count()
    t2 = time.perf_counter()
    print(f"{direction:>8} {name:>10}: cold {t1-t0:6.3f}s warm {t2-t1:6.3f}s rows {n1}")
    return n1


def main():
    spark = get_spark()
    # prime the session (JVM warm, events cache off — fresh read each var)
    spark.range(10).count()
    for direction in ("backward", "forward"):
        counts = {}
        for name, fn in [("window", v_window), ("samesrc", v_samesrc), ("mergeasof", v_mergeasof)]:
            counts[name] = run(name, fn, spark, direction)
        assert len(set(counts.values())) == 1, counts


if __name__ == "__main__":
    main()
