"""Declarative streaming pipelines: the reference's consumer roles.

Each function maps one consumer-thread role from the reference's
integration test (src/tests/integration_test.rs:221-288) onto a
streaming transformation. They take a streaming DataFrame and return a
streaming DataFrame — source and sink are the caller's choice, so the
same pipeline runs against the rate-source demo feed or the verifiable
file stream.

All aggregations use the same fixed-point BIGINT accumulation as the
batch queries (order-insensitive across micro-batches for the same
reason it is across partitions — see queries/helpers.py dsum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.queries.helpers import dsum


def windowed_throughput(
    stream: DataFrame,
    ts_col: str = "ts_ts",
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window message counts — consumer role 2 (progress /
    throughput accounting, reference src/tests/integration_test.rs:
    272-277, 303-315).

    Output: win_start_us, win_end_us, n. Watermark bounds state: closed
    windows are evicted — the drop-oldest retention analog
    (reference README.md:16).
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("win.start")).alias("win_start_us"),
            F.unix_micros(F.col("win.end")).alias("win_end_us"),
            F.col("n"),
        )
    )


def windowed_ohlc(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_ts",
    value_col: str = "value",
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming OHLC bars: per (symbol, tumbling window) open / high /
    low / close / volume — the live half of q_ohlc_bars' batch
    downsample (the canonical tick-store consumer the reference's VWAP
    loop gestures at, reference src/tests/integration_test.rs:240-256).

    open/close are min_by/max_by on the same total BIGINT ordering key
    the batch twin uses (ts_us*1000 + event_id%1000), so partial states
    merge across micro-batches without a window sort; volume goes
    through the fixed-point dsum fold, making the drained result
    bit-comparable to the batch oracle. Watermark evicts closed
    windows (bounded state).
    """
    ord_key = F.col("ts_us") * 1000 + F.col("event_id") % 1000
    return (
        stream.withWatermark(ts_col, watermark)
        .withColumn("_ord", ord_key)
        .groupBy(F.col(key_col), F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.min_by(value_col, "_ord").alias("open_v"),
            F.max(value_col).alias("high_v"),
            F.min(value_col).alias("low_v"),
            F.max_by(value_col, "_ord").alias("close_v"),
            F.count(F.lit(1)).alias("n_ticks"),
            dsum(value_col).alias("volume"),
        )
        .select(
            F.col(key_col),
            F.unix_micros(F.col("win.start")).alias("win_start_us"),
            "open_v",
            "high_v",
            "low_v",
            "close_v",
            "n_ticks",
            "volume",
        )
    )


def running_vwap(
    stream: DataFrame,
    key_col: str = "event_type",
    price_col: str = "value",
    qty_col: str = "qty",
    ts_col: str = "ts_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-key VWAP over the stream — consumer role 0 (reference
    src/tests/integration_test.rs:240-256 tracks Σprice/Σqty inputs per
    1000 records; here the ratio is explicit and exact-decimal).

    Output: key, n, sum_pq, sum_q, vwap.
    """
    pq = F.col(price_col) * F.col(qty_col)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(pq).alias("sum_pq"),
            dsum(F.col(qty_col)).alias("sum_q"),
        )
        .withColumn("vwap", F.col("sum_pq") / F.col("sum_q"))
    )


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming deduplication on ``keys``.

    With a watermark, uses ``dropDuplicatesWithinWatermark`` — state is
    evicted as event time passes (the 100 TB/unbounded-stream shape).
    Without one, global ``dropDuplicates`` (exact, unbounded state —
    only for bounded replays). Projecting exactly the key columns makes
    the result deterministic (set of distinct keys) regardless of
    arrival order.
    """
    projected = stream.select(*keys) if ts_col is None else stream.select(*keys, ts_col)
    if watermark and ts_col:
        return projected.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return projected.dropDuplicates(keys)


def latency_metrics(
    stream: DataFrame,
    ts_col: str = "ts_ts",
    now_us: int | None = None,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-window event-lag min/max/avg — consumer role 1 (reference
    src/tests/integration_test.rs:257-271: now - msg_ts per record,
    guarded positive, folded into min/max/mean).

    ``now_us`` pins "now" for deterministic replays; live streams pass
    None and use the micro-batch's current timestamp.
    """
    now = (
        F.lit(now_us)
        if now_us is not None
        else F.unix_micros(F.current_timestamp())
    )
    lag = now - F.unix_micros(F.col(ts_col))
    with_lag = stream.withColumn("lag_us", lag).filter(F.col("lag_us") > 0)
    return (
        with_lag.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lag_us").alias("min_lag_us"),
            F.max("lag_us").alias("max_lag_us"),
            # Integer lag -> BIGINT sum is exact and order-insensitive
            # with no decimal detour (DuckDB's DECIMAL(38,6)->DOUBLE
            # cast is not correctly rounded past 2^53; a single
            # int->double conversion is, in both engines).
            (F.sum("lag_us").cast("double") / F.count(F.lit(1))).alias("avg_lag_us"),
        )
        .select(
            F.unix_micros(F.col("win.start")).alias("win_start_us"),
            "n",
            "min_lag_us",
            "max_lag_us",
            "avg_lag_us",
        )
    )
