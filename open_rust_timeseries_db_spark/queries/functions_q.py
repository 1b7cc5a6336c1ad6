"""Function-coverage queries: the remaining built-in families from the
standard checklist (SURVEY.md §2.3) — ranking/distribution window
functions, date/time arithmetic, pivot, subqueries, null semantics, and
the cross-engine-exact math subset.

Determinism conventions as everywhere: total orderings with tie-break
keys, no transcendental functions whose libm rounding differs between
engines (sqrt is IEEE-exact; exp/log/sin are NOT and stay out of the
oracle surface), decimal accumulation for float sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.queries.helpers import events_us, sql_dsum
from open_rust_timeseries_db_spark.queries.registry import DEC, query
from open_rust_timeseries_db_spark.sources.catalog import load_table


@query(
    "q_window_funcs",
    """
    SELECT o_orderkey,
           o_custkey,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drank,
           PERCENT_RANK() OVER w AS prank,
           CUME_DIST() OVER w AS cdist,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    )
    """,
    doc="Ranking/distribution window battery per customer: dense_rank, "
    "percent_rank, cume_dist, ntile, first/nth value — one shuffle on "
    "the partition key, total ordering via the (price, orderkey) "
    "tie-break. Completes the §2.3 window-function checklist next to "
    "row_number (q_rank_per_group), lag (q_lag_delta), frames "
    "(q_moving_avg ROWS, q_range_frame RANGE).",
    tags=("functions", "window"),
)
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


@query(
    "q_date_funcs",
    """
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
           CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
           CAST(EXTRACT(dow FROM o_orderdate) AS INT) AS dow_sun0,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 90 DAY AS due_ts,
           CAST(date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE))
                AS BIGINT) AS days_since_2024
    FROM orders
    """,
    doc="Date/time arithmetic over the order timeline: component "
    "extraction, month truncation, interval addition, day difference "
    "from an epoch date. All calendar-exact (no float), so the oracle "
    "matches bit-for-bit; Spark's dayofweek is 1=Sunday, normalized to "
    "DuckDB's 0=Sunday.",
    tags=("functions", "datetime"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("int").alias("yr"),
        F.month(d).cast("int").alias("mo"),
        F.dayofmonth(d).cast("int").alias("dom"),
        (F.dayofweek(d) - 1).cast("int").alias("dow_sun0"),
        F.date_trunc("month", d).alias("month_start"),
        (d + F.expr("INTERVAL 90 DAYS")).alias("due_ts"),
        F.datediff(d.cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_2024"),
    )


@query(
    "q_pivot_revenue",
    f"""
    SELECT o_orderpriority,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS f_total,
           {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS o_total,
           {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS p_total
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Pivot: order status -> columns, exact-decimal revenue per "
    "(priority, status) cell. Spark's pivot with explicit values is one "
    "shuffle (no value-discovery pass — at 100 TB always pass the "
    "pivot values); the oracle is the equivalent CASE aggregation.",
    tags=("functions", "pivot"),
)
def q_pivot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    from open_rust_timeseries_db_spark.queries.helpers import (
        _scaled_long,
        fx_resum,
    )

    # Two-phase, overflow-safe (see q_rollup_revenue): fixed-point
    # BIGINT partials per (priority, status, split) — the pid key adds
    # no shuffle volume and bounds each partial by one input split —
    # then pivot the tiny partial table with an exact DECIMAL re-sum
    # per cell, so a hot (priority, status) cell can't wrap BIGINT at
    # any scale.
    partials = orders.groupBy(
        "o_orderpriority",
        "o_orderstatus",
        F.spark_partition_id().alias("pid"),
    ).agg(F.sum(_scaled_long(F.col("o_totalprice"))).alias("ps_fx"))
    pivoted = (
        partials.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(fx_resum("ps_fx"))
    )
    return pivoted.select(
        "o_orderpriority",
        F.col("F").alias("f_total"),
        F.col("O").alias("o_total"),
        F.col("P").alias("p_total"),
    )


@query(
    "q_subqueries",
    """
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
      AND EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
      )
    """,
    doc="Scalar + correlated-EXISTS subqueries: customers above the "
    "global average balance with an open order. Catalyst rewrites the "
    "scalar subquery to a broadcast single-row join and EXISTS to a "
    "left-semi join — no per-row re-execution at any scale. "
    "(avg comparison only filters — float avg is safe as a predicate "
    "on well-separated values, not as an output.)",
    tags=("functions", "subquery"),
)
def q_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cust.createOrReplaceTempView("customer")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, c.c_acctbal
        FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
          AND EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
          )
        """
    )


@query(
    "q_null_semantics",
    """
    SELECT event_id,
           COALESCE(NULLIF(event_type, 'view'), 'other') AS kind,
           CASE WHEN value IS NULL THEN -1.0 ELSE value END AS value_filled,
           CAST(value IS NOT NULL AS BOOLEAN) AS has_value,
           IFNULL(NULLIF(user_id, 0), -1) AS user_or_sentinel
    FROM events WHERE event_id % 11 = 0
    """,
    doc="Null-handling semantics: coalesce/nullif/ifnull/IS NULL — "
    "identical three-valued logic in both engines, narrow scan only.",
    tags=("functions", "null"),
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    return ev.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("view")), F.lit("other")).alias(
            "kind"
        ),
        F.when(F.col("value").isNull(), F.lit(-1.0))
        .otherwise(F.col("value"))
        .alias("value_filled"),
        F.col("value").isNotNull().alias("has_value"),
        F.ifnull(F.nullif("user_id", F.lit(0)), F.lit(-1)).alias("user_or_sentinel"),
    )


@query(
    "q_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_d,
           CAST(SIGN(l_discount - 0.05) AS INT) AS sign_d,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_price,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
           SQRT(l_quantity) AS sqrt_qty,
           l_extendedprice * l_quantity AS prod,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate,
           CAST(l_orderkey % 7 AS BIGINT) AS mod7
    FROM lineitem WHERE l_orderkey % 13 = 0
    """,
    doc="Math-function battery restricted to the cross-engine-EXACT "
    "subset: abs/sign/ceil/floor/mod are integer-exact, sqrt and * are "
    "correctly-rounded IEEE ops, greatest/least are comparisons. "
    "exp/log/pow/trig are deliberately excluded from the oracle surface "
    "— libm rounding differs between engines (they exist via F.* for "
    "users; they just can't be hash-compared).",
    tags=("functions", "math"),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 13 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        # int cast: Spark signum keeps IEEE signed zero (-0.0), DuckDB's
        # SIGN does not; the integer domain is unambiguous.
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("sign_d"),
        F.ceil("l_extendedprice").cast("bigint").alias("ceil_price"),
        F.floor("l_extendedprice").cast("bigint").alias("floor_price"),
        F.sqrt("l_quantity").alias("sqrt_qty"),
        (F.col("l_extendedprice") * F.col("l_quantity")).alias("prod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("mod7"),
    )


@query(
    "q_stats_moments",
    f"""
    WITH b AS (
      SELECT event_type, value AS x,
             CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DOUBLE)
               AS y
      FROM events
    ), s AS (
      SELECT event_type,
             COUNT(*) AS n,
             {sql_dsum("x")} AS sx,
             {sql_dsum("y")} AS sy,
             {sql_dsum("x * x")} AS sxx,
             {sql_dsum("y * y")} AS syy,
             {sql_dsum("x * y")} AS sxy
      FROM b GROUP BY event_type
    )
    SELECT event_type, n,
           sx / n AS mean_x,
           sxx / n - (sx / n) * (sx / n) AS var_pop_x,
           SQRT(sxx / n - (sx / n) * (sx / n)) AS stddev_pop_x,
           sxy / n - (sx / n) * (sy / n) AS covar_pop,
           (sxy / n - (sx / n) * (sy / n))
             / (SQRT(sxx / n - (sx / n) * (sx / n))
                * SQRT(syy / n - (sy / n) * (sy / n))) AS corr
    FROM s
    """,
    doc="Statistical aggregates per key — mean, population variance / "
    "stddev, covariance, Pearson correlation (value vs props.k). "
    "Built-in var_pop/corr accumulate IEEE doubles in partition order "
    "(non-deterministic cross-engine), so the moments are assembled "
    "from fixed-point BIGINT sums (Σx, Σx², Σxy — exact, associative; "
    "one shuffle, map-side partials) and combined with an identical "
    "IEEE op sequence in both engines. The two-pass textbook form is "
    "avoided: one scan, five sums.",
    tags=("functions", "statistics", "agg"),
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from open_rust_timeseries_db_spark.queries.helpers import dsum

    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.col("value").alias("x"),
        F.get_json_object("props", "$.k").cast("bigint").cast("double").alias("y"),
    )
    s = b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    mean_x = F.col("sx") / n
    mean_y = F.col("sy") / n
    var_x = F.col("sxx") / n - mean_x * mean_x
    var_y = F.col("syy") / n - mean_y * mean_y
    covar = F.col("sxy") / n - mean_x * mean_y
    return s.select(
        "event_type",
        "n",
        mean_x.alias("mean_x"),
        var_x.alias("var_pop_x"),
        F.sqrt(var_x).alias("stddev_pop_x"),
        covar.alias("covar_pop"),
        (covar / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr"),
    )
