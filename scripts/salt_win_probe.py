"""Probe: does salting WIN on a big-hot-bucket tier? (round-10 task #2)

Synthetic members table at production-gate scale (>= SALT_MIN_SOURCE_ROWS
total rows) with ONE 10k-member hot bucket: the unsalted grouped path
expands c*(c-1)/2 ~= 50M pairs in a single task; the salted path splits
the bucket S=5 ways (production thresholds untouched).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.session import get_spark
import open_rust_timeseries_db_spark.operators.dedupe as dd

HOT = 10_000
ORGANIC_KEYS = 34_000
ORGANIC_PER = 30


def members(spark):
    hot = spark.range(HOT).select(
        F.lit(0).alias("g"), F.col("id").alias("id")
    )
    org = spark.range(ORGANIC_KEYS * ORGANIC_PER).select(
        (F.col("id") % ORGANIC_KEYS + 1).alias("g"),
        (F.col("id") + HOT).alias("id"),
    )
    return hot.unionByName(org)


def run(name, fn):
    fn().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:>24}: {best:7.3f}s")
    return best


def main():
    spark = get_spark("saltwin", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    m = members(spark).persist()
    n = m.count()
    print("rows:", n, "gate:", dd.SALT_MIN_SOURCE_ROWS)
    n_un = dd.salted_group_pairs(m, ("g",), [], n_member_rows=0).count()
    n_sa = dd.salted_group_pairs(m, ("g",), [], n_member_rows=n).count()
    print("pairs unsalted:", n_un, "salted:", n_sa)
    assert n_un == n_sa, (n_un, n_sa)
    run("unsalted grouped", lambda: dd.salted_group_pairs(m, ("g",), [], n_member_rows=0))
    run("salted (production)", lambda: dd.salted_group_pairs(m, ("g",), [], n_member_rows=n))


if __name__ == "__main__":
    main()
