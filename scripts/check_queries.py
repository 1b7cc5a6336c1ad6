"""Spot-check named queries() entries vs their oracle_sql() on one sf dir.

Usage: python scripts/check_queries.py SF_DIR q_name [q_name ...]

Same vanilla-session + hash-compare contract as driver_sim.py, but only
for the named queries — the fast inner loop while iterating on one
operator (driver_sim runs all 100+).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as contract  # noqa: E402
from scripts.driver_sim import TABLE_NAMES, value_hash  # noqa: E402


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir, names = sys.argv[1], sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-queries")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = contract.queries(), contract.oracle_sql()
    n_fail = 0
    for name in names:
        t0 = time.time()
        got = qs[name](spark, sf_dir).toPandas()
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows in {dt:.2f}s")
            continue
        t1 = time.time()
        want = con.sql(oracles[name]).df()
        dto = time.time() - t1
        ok = (
            len(got) == len(want)
            and sorted(got.columns) == sorted(want.columns)
            and value_hash(got) == value_hash(want)
        )
        n_fail += not ok
        print(
            f"[{'PASS' if ok else 'FAIL'}] {name}: rows {len(got)}/{len(want)} "
            f"spark {dt:.2f}s oracle {dto:.2f}s"
        )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
