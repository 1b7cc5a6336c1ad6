"""applyInPandasWithState: running VWAP state must survive micro-batch
boundaries and converge to the batch-computed totals."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_rust_timeseries_db_spark.streaming.stateful import (
    RUNNING_VWAP_SCHEMA,
    running_vwap_stateful,
)

TICK_SCHEMA = T.StructType(
    [
        T.StructField("symbol_id", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("quantity", T.LongType()),
    ]
)


def test_running_vwap_state_across_batches(spark, tmp_path):
    src_dir = str(tmp_path / "ticks")
    ticks = spark.range(0, 3000).select(
        (F.col("id") % 4 + 100).alias("symbol_id"),
        (1000.0 + (F.col("id") % 500) * 0.01).alias("price"),
        (100 + F.col("id") % 100).alias("quantity"),
    )
    # 3 part files -> 3 micro-batches with maxFilesPerTrigger=1.
    ticks.repartition(3).write.mode("overwrite").parquet(src_dir)

    stream = (
        spark.readStream.schema(TICK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = running_vwap_stateful(stream)
    assert out.schema == RUNNING_VWAP_SCHEMA

    q = (
        out.writeStream.format("memory")
        .queryName("vwap_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()

    rows = spark.table("vwap_state").collect()
    # State crossed batches: each key emitted one changelog row per
    # micro-batch that touched it (3 files, 4 keys spread over all).
    per_key = {}
    for r in rows:
        per_key.setdefault(r["key"], []).append(r)
    assert set(per_key) == {100, 101, 102, 103}
    assert all(len(v) >= 2 for v in per_key.values()), {
        k: len(v) for k, v in per_key.items()
    }

    # The final (largest-n) row per key equals the batch cumulative.
    batch = (
        ticks.groupBy("symbol_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("price") * F.col("quantity") * 1_000_000).cast("long")
            ).alias("sum_pq_fx"),
            F.sum("quantity").alias("sum_q"),
        )
        .collect()
    )
    want = {r["symbol_id"]: (r["n"], r["sum_pq_fx"], r["sum_q"]) for r in batch}
    for key, emitted in per_key.items():
        final = max(emitted, key=lambda r: r["n"])
        assert (final["n"], final["sum_pq_fx"], final["sum_q"]) == want[key]
        assert final["vwap"] == (final["sum_pq_fx"] / 1_000_000) / final["sum_q"]


def test_transform_with_state_running_minmax(spark, tmp_path):
    """Running per-key min/max/count state must survive micro-batches
    and converge to the batch-computed truth.

    The operator auto-selects its backend: transformWithStateInPandas
    where the protobuf runtime exists, its applyInPandasWithState twin
    otherwise — the changelog contract under test is identical, so this
    runs unconditionally (no environment skip)."""
    from open_rust_timeseries_db_spark.streaming.stateful import (
        RUNNING_MINMAX_SCHEMA,
        running_minmax_stateful,
    )

    src_dir = str(tmp_path / "vals")
    vals_schema = T.StructType(
        [
            T.StructField("symbol_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    data = spark.range(0, 3000).select(
        (F.col("id") % 4 + 100).alias("symbol_id"),
        ((F.col("id") % 997) * 0.5 - 100.0).alias("value"),
    )
    data.repartition(3).write.mode("overwrite").parquet(src_dir)

    stream = (
        spark.readStream.schema(vals_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = running_minmax_stateful(stream, key_col="symbol_id", value_col="value")
    assert out.schema == RUNNING_MINMAX_SCHEMA

    q = (
        out.writeStream.format("memory")
        .queryName("minmax_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()

    rows = spark.table("minmax_state").collect()
    # Multiple micro-batches touched each key -> multiple changelog
    # rows; the LAST (largest n) must equal the batch truth.
    last = {}
    for r in rows:
        if r["key"] not in last or r["n"] > last[r["key"]]["n"]:
            last[r["key"]] = r
    truth = {
        r["symbol_id"]: r
        for r in data.groupBy("symbol_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .collect()
    }
    assert set(last) == set(truth)
    for k, t in truth.items():
        got = last[k]
        assert got["n"] == t["n"]
        assert got["min_v"] == t["min_v"]
        assert got["max_v"] == t["max_v"]
    assert len(rows) > len(truth)  # state actually crossed batches
