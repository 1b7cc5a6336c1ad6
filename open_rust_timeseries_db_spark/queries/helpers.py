"""Shared builders enforcing the determinism conventions of the registry."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.queries.registry import DEC
from open_rust_timeseries_db_spark.sources.catalog import load_table


def events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts_us`` (epoch-µs long) added.

    Spark reads events.ts as epoch-nanos (lossless); DuckDB truncates the
    same parquet to µs at read. ``ts div 1000`` floor-truncates nanos so
    both engines operate on the identical integer µs value.
    """
    return load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts div 1000")
    )


def spread_scan(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Unlock parallelism for CPU-heavy map work over a tiny scan.

    The testdata parquet files are written as a SINGLE row group, so the
    scan — and every narrow op fused onto it (tokenize, hash, explode)
    — runs as ONE task regardless of ``maxPartitionBytes``. For
    pipelines whose map side is the expensive part, a round-robin
    repartition spreads that work across the executor cores at the cost
    of shuffling the raw rows once (cheap at small-file size, by
    definition).

    Gated on the actual scan partition count so it is a NO-OP at scale:
    a real multi-row-group / multi-file corpus already splits, and the
    full-data shuffle this would add there is exactly what we avoid.
    """
    if df.rdd.getNumPartitions() > 1:
        return df
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(partitions)


def dsum(col: Column | str) -> Column:
    """Order-insensitive double sum: exact DECIMAL accumulation.

    IEEE double addition is order-sensitive, and Spark's partition order
    differs from DuckDB's scan order; summing in decimal is exact, so the
    final double is bit-identical in both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-insensitive average: exact sum(decimal) -> double / count.

    NOT rounded: identical operands + identical IEEE ops give the same
    double in both engines. Rounding would *add* risk — dyadic doubles
    land exactly on .5 ties where Spark rounds HALF_UP and DuckDB
    HALF_EVEN (e.g. a rate of exactly 1/128 = 0.0078125).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


# DuckDB-side fragments mirroring the helpers above (kept adjacent so the
# two dialects evolve together).
def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
