"""Warehouse flagship queries — TPC-H-shaped multi-join aggregations
over the star schema (lineitem/orders/customer/supplier/nation/region).

The reference is a single-table ingest engine (SURVEY.md §2.2); these
queries are the standard warehouse workload a user of a timeseries/OLAP
store expects on top, and they are the clearest showcase of the plans
that matter at 100 TB:

- dimension tables broadcast (no shuffle of the fact side for the
  dim joins — asserted for the small-dim join in tests/test_plans.py);
- filters reach the parquet scans (shipdate/orderdate predicates prune
  row groups; at scale, partition columns);
- aggregation is partial+final with exact decimal accumulation
  (queries/helpers.dsum) so results are bit-stable under any partition
  order.

Shapes follow TPC-H Q1/Q3/Q5 adapted to the testdata schema (orders has
o_orderpriority, not o_shippriority; suppliers join through nationkey).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.queries.helpers import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
from open_rust_timeseries_db_spark.queries.registry import query
from open_rust_timeseries_db_spark.sources.catalog import load_table

_Q1_CUTOFF = "2000-09-01"
_Q3_DATE = "1996-03-15"
_Q5_START, _Q5_END = "1996-01-01", "1997-01-01"

# Both engines evaluate the identical double expression per row
# (left-assoc products of the same operands), so the decimal-summed
# result is bit-equal.
_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))


@query(
    "q_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity")} AS sum_qty,
           {sql_dsum("l_extendedprice")} AS sum_base_price,
           {sql_dsum(_REV)} AS sum_disc_price,
           {sql_dsum(_REV + " * (1 + l_tax)")} AS sum_charge,
           {sql_davg("l_quantity")} AS avg_qty,
           {sql_davg("l_extendedprice")} AS avg_price,
           {sql_davg("l_discount")} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape (pricing summary): single-pass scan with the "
    "shipdate predicate pushed to parquet, 8 simultaneous aggregates in "
    "one partial+final hash agg over a 6-value group key — the shuffle "
    "carries one row per (partition, group). The canonical 'is the agg "
    "path right' probe at any scale.",
    tags=("warehouse", "tpch", "aggregation"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = _rev_col()
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(rev).alias("sum_disc_price"),
            dsum(rev * (F.lit(1) + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {sql_dsum(_REV)} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
      AND l.l_shipdate > TIMESTAMP '{_Q3_DATE}'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): segment-filtered customer "
    "broadcasts into orders, the date predicates push to both scans, "
    "and the lineitem join shuffles only date-surviving rows; top-10 is "
    "TakeOrderedAndProject (no global sort). Ordering made total "
    "(revenue DESC, l_orderkey) so LIMIT is deterministic cross-engine.",
    tags=("warehouse", "tpch", "join", "topk"),
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Broadcast sides carry ONLY the columns the query reads: the
    # round-9 shape broadcast the full orders x customer row (every
    # column of both tables), which made the per-invocation broadcast
    # build the query's bottleneck — and explains its sf1 warm==cold
    # anomaly (each pass rebuilds the broadcast, so a second pass buys
    # nothing). Skinny projections cut the steady per-pass cost ~25%
    # at sf1 (measured A/B). The broadcast itself stays the right
    # local-tier plan (shuffle_hash measured 2x worse, merge 3x); at
    # 100 TB the filtered orders side stops fitting and AQE/stats
    # would flip this join to SMJ — the hint encodes the tier, the
    # projection discipline carries to any tier.
    #
    # The post-join aggregate groups on l_orderkey ALONE and carries
    # the order attributes as first(): orders is unique per orderkey,
    # so o_orderdate/o_orderpriority are constant within each group
    # and first() is deterministic — same rows, skinnier hash-agg key.
    # Adopted from scripts/ship_preagg_probe.py ("preagg_semi",
    # SHIP_PREAGG_PROBE.json): measured best of four join/agg shapes
    # at sf1 (0.93 s vs 1.01 s median, tightest spread); the probe
    # also REJECTED pre-aggregating lineitem before the join (2.9x
    # slower — the extra orderkey shuffle dwarfs the probe-side
    # shrink). The residual sf1 over-gate margin is the
    # dims-broadcast-build jobs + session floor, adjudicated in
    # BASELINE.md.
    cutoff = F.lit(_Q3_DATE).cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    dims = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    return (
        li.join(F.broadcast(dims), li["l_orderkey"] == dims["o_orderkey"])
        .groupBy("l_orderkey")
        .agg(
            dsum(_rev_col()).alias("revenue"),
            F.first("o_orderdate").alias("o_orderdate"),
            F.first("o_orderpriority").alias("o_orderpriority"),
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q_region_revenue",
    f"""
    SELECT n.n_name, {sql_dsum(_REV)} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '{_Q5_START}'
      AND o.o_orderdate < TIMESTAMP '{_Q5_END}'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape (local supplier volume): six-table star join — "
    "region/nation/customer/supplier are broadcast dims, so lineitem "
    "and orders shuffle once on orderkey and every other join is "
    "map-side; the s_nationkey = c_nationkey equality is the 'local "
    "supplier' semi-cartesian guard. The pattern that either broadcasts "
    "or dies at 100 TB.",
    tags=("warehouse", "tpch", "join"),
)
def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q5_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q5_END).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(dims), orders["o_custkey"] == dims["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (supp["s_nationkey"] == dims["c_nationkey"]),
        )
        .groupBy("n_name")
        .agg(dsum(_rev_col()).alias("revenue"))
    )


@query(
    "q_unpivot_measures",
    f"""
    WITH s AS (
      SELECT l_returnflag,
             {sql_dsum("l_quantity")} AS sum_qty,
             {sql_dsum("l_extendedprice")} AS sum_price,
             {sql_dsum("l_discount")} AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, value FROM (
      SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM s
      UNION ALL
      SELECT l_returnflag, 'sum_price', sum_price FROM s
      UNION ALL
      SELECT l_returnflag, 'sum_disc', sum_disc FROM s
    )
    """,
    doc="UNPIVOT (wide -> long): per-returnflag measure columns melted "
    "to (key, measure, value) rows — the inverse of q_pivot_revenue, "
    "and the shape normalization step metric pipelines need before a "
    "generic sink. Spark's unpivot() expands AFTER the aggregation, so "
    "the melt multiplies a tiny grouped frame, never the fact scan; "
    "the oracle's UNION-ALL form scans its 3-row CTE three times "
    "(DuckDB materializes CTEs — on Spark that shape would re-run the "
    "aggregate per branch, the exact trap unpivot avoids).",
    tags=("warehouse", "unpivot", "reshape"),
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_discount").alias("sum_disc"),
    )
    return s.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@query(
    "q_percent_of_total",
    f"""
    WITH s AS (
      SELECT o_orderpriority,
             {sql_dsum("o_totalprice")} AS revenue,
             CAST(SUM(CAST(FLOOR(o_totalprice*1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS rfx
      FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, revenue,
           CAST(rfx AS DOUBLE)
             / CAST(CAST(SUM(rfx) OVER () AS BIGINT) AS DOUBLE) AS share
    FROM s
    """,
    doc="Ratio-to-report (percent of total): each order priority's "
    "share of global revenue — the OLAP reporting staple "
    "(RATIO_TO_REPORT in Oracle/Trino terms). The share window runs "
    "over the POST-AGGREGATION priority table (5 rows), never raw "
    "orders, so the single-task window is bounded by the group-key "
    "cardinality at any data scale. Determinism: shares divide the "
    "BIGINT fixed-point partials (a window SUM over doubles would "
    "re-accumulate in engine-specific order), one identical IEEE "
    "cast-divide per row.",
    tags=("warehouse", "window", "report"),
)
def q_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from open_rust_timeseries_db_spark.queries.helpers import _scaled_long

    orders = load_table(spark, sf_dir, "orders")
    s = orders.groupBy("o_orderpriority").agg(
        dsum("o_totalprice").alias("revenue"),
        F.sum(_scaled_long(F.col("o_totalprice")))
        .cast("bigint")
        .alias("rfx"),
    )
    w = Window.partitionBy()
    return s.select(
        "o_orderpriority",
        "revenue",
        (
            F.col("rfx").cast("double")
            / F.sum("rfx").over(w).cast("bigint").cast("double")
        ).alias("share"),
    )


@query(
    "q_mom_growth",
    f"""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month_start,
             {sql_dsum("o_totalprice")} AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month_start, revenue,
           (revenue - LAG(revenue) OVER (ORDER BY month_start))
             / LAG(revenue) OVER (ORDER BY month_start) AS mom_growth
    FROM m
    """,
    doc="Month-over-month growth: monthly revenue with its relative "
    "change from the prior month — the period-over-period reporting "
    "staple. The lag window runs over the POST-AGGREGATION month "
    "spine (rows bounded by the calendar span, like "
    "q_recursive_calendar), never the fact scan; revenues are exact "
    "dsum doubles so the growth ratio is identical IEEE ops on "
    "identical operands (first month NULL in both engines).",
    tags=("warehouse", "window", "report"),
)
def q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start")
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = Window.orderBy("month_start")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month_start",
        "revenue",
        ((F.col("revenue") - prev) / prev).alias("mom_growth"),
    )
