"""Decompose q_asof_join's warm time at sf1: scan vs shuffle vs window.

Each stage is timed warm (min of 3 after one priming run) under the
bench.py session config so numbers are comparable to ORACLE_BENCH_SF1.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.session import get_spark
from open_rust_timeseries_db_spark.queries.helpers import events_us

SF = "/root/repo/testdata_sf1"


def timeit(name, mk):
    # priming + 3 timed runs, min
    mk().count()
    best = min(
        (lambda t0: (mk().count(), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )
    print(f"{name:>28}: {best:6.3f}s")


def main():
    spark = get_spark("bench", shuffle_partitions=23)
    spark.sparkContext.setLogLevel("ERROR")
    ev = events_us(spark, SF)

    def tagged():
        return ev.filter(F.col("event_type").isin("purchase", "click")).select(
            F.col("user_id").alias("__key"),
            F.col("ts_us").alias("__ts"),
            F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0)).alias("__tag"),
            "event_id",
            "value",
        )

    timeit("scan+filter only", tagged)
    timeit("scan+exchange(key)", lambda: tagged().repartition(23, "__key"))
    timeit("scan+exch+sort", lambda: tagged().repartition(23, "__key")
           .sortWithinPartitions("__key", "__ts", "__tag"))

    def full():
        w = (Window.partitionBy("__key").orderBy("__ts", "__tag")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        t = tagged()
        rts = F.when(F.col("__tag") == 0, F.col("__ts"))
        rval = F.when(F.col("__tag") == 0, F.col("value"))
        return t.select(
            "__tag", "event_id",
            F.last(rts, ignorenulls=True).over(w).alias("asof_ts"),
            F.last(rval, ignorenulls=True).over(w).alias("asof_value"),
        ).filter((F.col("__tag") == 1) & F.col("asof_ts").isNotNull())

    timeit("full window asof", full)

    # one-window variant: single last() over a struct
    def one_win():
        w = (Window.partitionBy("__key").orderBy("__ts", "__tag")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        t = tagged()
        rstruct = F.when(F.col("__tag") == 0, F.struct("__ts", "value"))
        return t.select(
            "__tag", "event_id",
            F.last(rstruct, ignorenulls=True).over(w).alias("m"),
        ).filter((F.col("__tag") == 1) & F.col("m").isNotNull())

    timeit("one-window struct asof", one_win)


if __name__ == "__main__":
    main()
