"""Reference-parity analytics: the consumer-thread workload made explicit.

The reference's only "queries" live in its consumer threads
(reference src/tests/integration_test.rs:221-320): VWAP-style tracking,
event-time latency deltas, latency min/max/mean/percentiles, throughput,
modulo sampling, drop accounting, and per-op grouped averages. Each is
re-expressed here as a declarative DataFrame query over the ``events``
table (the testdata analog of the reference's market_data stream) with a
DuckDB oracle.

Scale notes per query are inline: these are all single-shuffle
hash-aggregations or narrow projections; at 100 TB the only heavy one is
the exact global percentile (see q_latency_percentiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.queries.helpers import (
    davg,
    dsum,
    events_us,
    sql_davg,
    sql_dsum,
)
from open_rust_timeseries_db_spark.queries.registry import DEC, FIXED_NOW_US, query
from open_rust_timeseries_db_spark.sources.catalog import load_table

# DuckDB fragment for epoch-µs of events.ts (Spark side: ts div 1000).
TS_US = "epoch_us(ts)"


@query(
    "q_vwap_by_symbol",
    f"""
    SELECT user_id,
           COUNT(*) AS n_trades,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_qty,
           {sql_dsum("value * CAST(json_extract_string(props, '$.k') AS BIGINT)")}
             / NULLIF(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)), 0) AS vwap
    FROM events
    GROUP BY user_id
    """,
    doc="VWAP per key: sum(price*qty)/sum(qty). Reference consumer 0 "
    "tracks (price, quantity) per record and reports VWAP updates "
    "(src/tests/integration_test.rs:240-256); price=value, qty=props.k. "
    "Scale: one hash-agg shuffle on user_id; partial aggregation map-side.",
    tags=("parity", "agg"),
)
def q_vwap_by_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    qty = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("user_id", "value", qty.alias("qty"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_trades"),
            F.sum("qty").alias("sum_qty"),
            (
                dsum(F.col("value") * F.col("qty"))
                / F.nullif(F.sum("qty"), F.lit(0))
            ).alias("vwap"),
        )
    )


@query(
    "q_latency_summary",
    f"""
    SELECT event_type,
           COUNT(*) AS n,
           MIN({FIXED_NOW_US} - {TS_US}) AS min_lag_us,
           MAX({FIXED_NOW_US} - {TS_US}) AS max_lag_us,
           CAST(SUM({FIXED_NOW_US} - {TS_US}) AS BIGINT) AS total_lag_us,
           CAST(SUM({FIXED_NOW_US} - {TS_US}) AS DOUBLE) / COUNT(*) AS avg_lag_us
    FROM events
    GROUP BY event_type
    """,
    doc="min/max/sum/count/mean of event-time lag vs a pinned 'now' — the "
    "reference's LatencyMetrics fold (src/tests/integration_test.rs:"
    "334-357,366-368) with now pinned for determinism. Integer lag in µs "
    "keeps every aggregate exact. Scale: single hash-agg on a low-"
    "cardinality key.",
    tags=("parity", "agg"),
)
def q_latency_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    lag = (F.lit(FIXED_NOW_US) - F.col("ts_us")).alias("lag_us")
    return (
        ev.select("event_type", lag)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lag_us").alias("min_lag_us"),
            F.max("lag_us").alias("max_lag_us"),
            F.sum("lag_us").alias("total_lag_us"),
            (F.sum("lag_us").cast("double") / F.count(F.lit(1))).alias("avg_lag_us"),
        )
    )


_PCTS = [("p50", 0.50), ("p90", 0.90), ("p99", 0.99), ("p999", 0.999), ("p9999", 0.9999)]


@query(
    "q_latency_percentiles",
    f"""
    WITH lags AS (
      SELECT {FIXED_NOW_US} - {TS_US} AS lag_us, event_id FROM events
    ), ranked AS (
      SELECT lag_us,
             ROW_NUMBER() OVER (ORDER BY lag_us, event_id) AS rn,
             COUNT(*) OVER () AS n
      FROM lags
    )
    SELECT
      {", ".join(f"MAX(CASE WHEN rn = CAST(ROUND({p} * (n - 1)) AS BIGINT) + 1 THEN lag_us END) AS {nm}" for nm, p in _PCTS)}
    FROM ranked
    """,
    doc="Nearest-rank P50/P90/P99/P99.9/P99.99 of event lag — exactly the "
    "reference's sort-then-index percentile (src/tests/integration_test.rs:"
    "359-364: sort_unstable + round(p*(n-1))). Implemented rank-based so "
    "Spark and DuckDB agree bit-for-bit (interpolating percentile "
    "implementations differ between engines). Scale: binned two-pass "
    "selection (operators.percentiles.nearest_rank_percentiles) — every "
    "row-level pass is parallel; the serial window sees only the "
    "bounded bin histogram, so the exact answer survives 100 TB.",
    tags=("parity", "agg", "percentile"),
)
def q_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from open_rust_timeseries_db_spark.operators.percentiles import (
        PARQUET_SORT_MAX_BYTES,
        nearest_rank_percentiles,
    )
    from open_rust_timeseries_db_spark.sources.catalog import table_bytes

    ev = events_us(spark, sf_dir)
    lags = ev.select(
        (F.lit(FIXED_NOW_US) - F.col("ts_us")).alias("lag_us"), "event_id"
    )
    # Zero-cost strategy gate: a stat() of the table instead of a
    # driver-side Catalyst estimate per call; unknown (-1) is "too
    # big" and takes the strategy safe at any scale.
    nbytes = table_bytes(sf_dir, "events")
    strategy = (
        "window" if 0 < nbytes <= PARQUET_SORT_MAX_BYTES else "binned"
    )
    return nearest_rank_percentiles(
        lags, "lag_us", _PCTS, tiebreak="event_id", strategy=strategy
    )


@query(
    "q_minmax_value",
    """
    SELECT event_type, COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
    doc="Running min/max fold per group — the reference's lock-free "
    "update_max_latency CAS loop (src/tests/integration_test.rs:80-93) "
    "is Spark's map-side partial min/max. No float arithmetic, so "
    "doubles pass through exactly.",
    tags=("parity", "agg"),
)
def q_minmax_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events_us(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@query(
    "q_event_lag",
    f"""
    SELECT event_id, user_id, {FIXED_NOW_US} - {TS_US} AS lag_us
    FROM events
    WHERE {FIXED_NOW_US} - {TS_US} > 0
    """,
    doc="Per-record event-time delta with positivity guard — reference "
    "consumer 1 (src/tests/integration_test.rs:257-271, delta at "
    ":266-268) with 'now' pinned. Narrow projection+filter: no shuffle, "
    "fully pushed down.",
    tags=("parity", "projection"),
)
def q_event_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    lag = (F.lit(FIXED_NOW_US) - F.col("ts_us")).alias("lag_us")
    return ev.select("event_id", "user_id", lag).filter(F.col("lag_us") > 0)


@query(
    "q_throughput_window",
    f"""
    SELECT ({TS_US} - {TS_US} % 3600000000) AS hour_us,
           COUNT(*) AS n_events,
           COUNT(*) / 3600.0 AS events_per_sec,
           {sql_dsum("value")} AS sum_value
    FROM events
    GROUP BY 1
    """,
    doc="Tumbling 1-hour window throughput: messages/sec per window — the "
    "reference's total/elapsed throughput metric "
    "(src/tests/integration_test.rs:303-315) made windowed. Window key "
    "derived by integer µs arithmetic so both engines bucket identically. "
    "Scale: classic streaming agg; the streaming twin lives in "
    "streaming.demo.",
    tags=("parity", "agg", "window"),
)
def q_throughput_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    hour = (F.col("ts_us") - F.col("ts_us") % F.lit(3_600_000_000)).alias("hour_us")
    return (
        ev.select(hour, "value")
        .groupBy("hour_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.count(F.lit(1)) / F.lit(3600.0)).alias("events_per_sec"),
            dsum("value").alias("sum_value"),
        )
    )


@query(
    "q_modulo_sample",
    """
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_id % 100 = 0
    """,
    doc="Deterministic 1-in-N sample — reference consumers act on every "
    "1000th record (src/tests/integration_test.rs:250,273). Narrow "
    "filter; predicate pushed to the scan.",
    tags=("parity", "projection"),
)
def q_modulo_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") % 100 == 0).select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "q_conditional_count",
    """
    SELECT event_type,
           COUNT(*) AS n_total,
           COUNT(CASE WHEN value > 150 THEN 1 END) AS n_flagged,
           CAST(COUNT(CASE WHEN value > 150 THEN 1 END) AS DOUBLE) / COUNT(*) AS flag_rate
    FROM events GROUP BY event_type
    """,
    doc="Conditional count + rate — the reference's dropped-message "
    "accounting (failed writes after retries, "
    "src/tests/integration_test.rs:61,178-196) as a declarative "
    "count(when). Single hash-agg.",
    tags=("parity", "agg"),
)
def q_conditional_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    flagged = F.count(F.when(F.col("value") > 150, F.lit(1)))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        flagged.alias("n_flagged"),
        (flagged.cast("double") / F.count(F.lit(1))).alias("flag_rate"),
    )


@query(
    "q_groupby_avg",
    f"""
    SELECT event_type, COUNT(*) AS n, {sql_davg("value")} AS avg_value
    FROM events GROUP BY event_type
    """,
    doc="Grouped mean — the reference's per-operation avg-ns micro-bench "
    "accumulation into HashMap<op, avg> (src/tests/integration_test.rs:"
    "592-718). Decimal-exact summation keeps the double deterministic.",
    tags=("parity", "agg"),
)
def q_groupby_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), davg("value").alias("avg_value"))
    )


@query(
    "q_topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Top-k by value with total tie-break — the reference's sorted "
    "report (src/tests/integration_test.rs:714-715) as TakeOrdered. "
    "Scale: Spark computes per-partition top-k then merges k*parts rows; "
    "no full sort.",
    tags=("parity", "sort"),
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q_filter_pushdown",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_quantity < 10
    """,
    doc="Selective scan: both predicates and the 4-column projection reach "
    "the parquet reader (PushedFilters + ReadSchema; asserted in "
    "tests/test_plans.py). The reference has no pushdown — calls execute "
    "as written (SURVEY §4.1).",
    tags=("parity", "scan"),
)
def q_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "q_group_percentiles",
    """
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY value, event_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           MAX(CASE WHEN rn = CAST(ROUND(0.50 * (n - 1)) AS BIGINT) + 1
                    THEN value END) AS p50,
           MAX(CASE WHEN rn = CAST(ROUND(0.90 * (n - 1)) AS BIGINT) + 1
                    THEN value END) AS p90,
           MAX(CASE WHEN rn = CAST(ROUND(0.99 * (n - 1)) AS BIGINT) + 1
                    THEN value END) AS p99,
           CAST(MAX(n) AS BIGINT) AS n
    FROM ranked GROUP BY event_type
    """,
    doc="Exact nearest-rank percentiles PER KEY (reference's percentile "
    "formula, src/tests/integration_test.rs:359-364, scoped per "
    "event_type) — the grouped form is how exact percentiles survive "
    "at scale: each key sorts independently in its own partition "
    "instead of one global single-task sort. Total tie-break "
    "(value, event_id) keeps rank assignment deterministic. Runs with "
    "AQE off: the two-exchange histogram plan is statically sized "
    "(balanced high-cardinality (key,value) first exchange, bounded "
    "distinct-value histogram second), so AQE's runtime re-plan buys "
    "nothing at any scale while splitting the action into 3 stage-jobs "
    "whose scheduler floor WAS the query's entire over-gate margin "
    "(GROUPPCT_FUSE_PROBE.json: 1 job, sf1 median 0.53 s vs 0.70 s; "
    "array-fold and single-exchange fusions measured-rejected there).",
    tags=("parity", "percentile", "window"),
    session_confs={"spark.sql.adaptive.enabled": "false"},
)
def q_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from open_rust_timeseries_db_spark.operators.percentiles import (
        nearest_rank_percentiles_by,
    )

    ev = load_table(spark, sf_dir, "events")
    return nearest_rank_percentiles_by(
        ev,
        key_col="event_type",
        value_col="value",
        percentiles=[("p50", 0.50), ("p90", 0.90), ("p99", 0.99)],
        tiebreak="event_id",
    )
