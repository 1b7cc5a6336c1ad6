"""Probe: can q_group_percentiles' residual stage fixed cost be fused away?

Round-11 verdict item #7: at sf1 the committed cold is 5.51x a 0.41 s
oracle while in-job time is 0.50 s over 3 AQE jobs — the margin is
stage/job fixed cost, not compute. Candidates:

current   — hist groupBy(key,value) -> cum window(key) -> final agg
            (2 exchanges; the measured-best strategy from
            scripts/grouppct_probe.py, kept as the control)
fused_arr — hist groupBy(key,value) -> groupBy(key)
            collect_list(struct(value,c)) -> ONE projection that
            sorts the per-key histogram array and walks its prefix
            sums inline (no window sort, no third operator class).
            Same 2 exchanges, but the second stage is a single
            hash-agg and the rank selection is expression-only.
            Scale note: the collected array is the per-key DISTINCT
            histogram (bounded by value cardinality), same state the
            window variant already funnels through one task per key.
keyed_1x  — repartition(key) FIRST, then hist+window+agg all ride the
            single key-hash exchange (HashPartitioning(key) satisfies
            the (key,value) clustering). 1 exchange, but the shuffle
            carries RAW rows (no map-side combine) and parallelism
            collapses to n_keys tasks — the known 100x scale-killer;
            measured here only to price the exchange we keep.
aqe_off   — current plan with AQE disabled for the action: one
            multi-stage job instead of 3 stage-jobs, no runtime
            re-plan. Prices the per-job scheduler floor.

Verdict from the committed run (PROBE JSON alongside): see
GROUPPCT_FUSE_PROBE.json.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.operators.percentiles import (
    nearest_rank_percentiles_by,
)
from open_rust_timeseries_db_spark.session import get_spark
from open_rust_timeseries_db_spark.sources.catalog import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
PCTS = [("p50", 0.50), ("p90", 0.90), ("p99", 0.99)]


def v_current(spark):
    ev = load_table(spark, SF, "events")
    return nearest_rank_percentiles_by(
        ev, "event_type", "value", PCTS, tiebreak="event_id"
    )


def _rank_exprs():
    # rn = round(p * (n-1)) + 1 per the nearest-rank contract.
    return [(name, F.round(F.lit(p) * (F.col("__n") - 1)).cast("bigint") + 1)
            for name, p in PCTS]


def v_fused_arr(spark):
    ev = load_table(spark, SF, "events")
    hist = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", "value")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    packed = hist.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("value"), F.col("__c")))
        ).alias("__h"),
        F.sum("__c").alias("__n"),
    )
    # Prefix-walk the sorted histogram once per target rank, expression
    # only: aggregate carries (cum, picked) and stops updating `picked`
    # after the rank falls inside a bucket.
    def pick(rank):
        return F.aggregate(
            F.col("__h"),
            F.struct(F.lit(0).cast("bigint").alias("cum"),
                     F.lit(None).cast("double").alias("v")),
            lambda acc, x: F.struct(
                (acc["cum"] + x["__c"]).alias("cum"),
                F.when(
                    acc["v"].isNull()
                    & (rank <= acc["cum"] + x["__c"]),
                    x["value"],
                ).otherwise(acc["v"]).alias("v"),
            ),
            lambda acc: acc["v"],
        )

    cols = [F.col("event_type")]
    for name, rank in _rank_exprs():
        cols.append(pick(rank).alias(name))
    cols.append(F.col("__n").cast("bigint").alias("n"))
    return packed.select(*cols)


def v_keyed_1x(spark):
    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
        .repartition("event_type")
    )
    hist = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "event_type", "value", "__c",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(Window.partitionBy("event_type")).alias("__n"),
    )
    aggs = []
    for name, rank in _rank_exprs():
        aggs.append(
            F.max(
                F.when(
                    (F.col("__cum") - F.col("__c") < rank)
                    & (rank <= F.col("__cum")),
                    F.col("value"),
                )
            ).alias(name)
        )
    aggs.append(F.max("__n").cast("bigint").alias("n"))
    return cum.groupBy("event_type").agg(*aggs)


def _collect_with_jobs(spark, df):
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    t0 = time.perf_counter()
    rows = df.collect()
    dt = time.perf_counter() - t0
    after = set(tracker.getJobIdsForGroup(None) or [])
    return rows, dt, len(after - before)


def main():
    spark = get_spark("gpct_fuse", shuffle_partitions=23)
    spark.sparkContext.setLogLevel("ERROR")

    variants = [
        ("current", v_current, None),
        ("fused_arr", v_fused_arr, None),
        ("keyed_1x", v_keyed_1x, None),
        ("aqe_off", v_current, {"spark.sql.adaptive.enabled": "false"}),
    ]

    ref = {tuple(sorted(r.asDict().items()))
           for r in v_current(spark).collect()}
    for name, fn, _ in variants[1:3]:
        got = {tuple(sorted(r.asDict().items())) for r in fn(spark).collect()}
        assert got == ref, (name, sorted(got)[:1], sorted(ref)[:1])

    out = {"sf_dir": SF, "percentiles": [p for _, p in PCTS],
           "rolls": {}, "n_jobs": {}}
    for _round in range(3):
        for name, fn, confs in variants:
            saved = {}
            if confs:
                for k, v in confs.items():
                    saved[k] = spark.conf.get(k)
                    spark.conf.set(k, v)
            try:
                _, dt, njobs = _collect_with_jobs(spark, fn(spark))
            finally:
                for k, v in saved.items():
                    spark.conf.set(k, v)
            out["rolls"].setdefault(name, []).append(round(dt, 4))
            out["n_jobs"][name] = njobs
    for name, ts in out["rolls"].items():
        s = sorted(ts)
        out.setdefault("median", {})[name] = s[len(s) // 2]
        out.setdefault("min", {})[name] = s[0]
    print(json.dumps(out, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
