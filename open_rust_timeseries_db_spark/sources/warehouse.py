"""Bucketed warehouse tables: co-located joins without shuffles.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides
on the key. Bucketing pre-partitions the data ON DISK by hash(key):
both sides written with the same bucket count join bucket-to-bucket —
zero Exchange in the plan, verified by tests/test_bucketing.py.

This is the persistent-layout analog of the reference's per-field ring
partitioning (reference src/storage/table.rs:44-48 fixes layout at
table-create time; here the layout IS the join strategy). Bucketed
tables require the session catalog (`saveAsTable`), not bare parquet
paths — bucket metadata lives in the catalog.

Usage pattern at scale: bucket the biggest fact tables on their join
key once at ingest; every subsequent join against them is shuffle-free
on that key, and bucket pruning serves point lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    Sorting within buckets additionally enables merge-join without an
    in-memory sort and better min/max pruning.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata intact)."""
    return spark.table(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.

    With matching bucket specs Catalyst plans a SortMergeJoin whose
    children read buckets directly — no Exchange on either side.
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
