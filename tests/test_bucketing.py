"""Bucketed co-located join: the zero-shuffle fact-fact join proof.

Writes orders and lineitem bucketed on the join key with the same
bucket count, joins them, and asserts the plan contains NO Exchange —
the property that makes the join scale linearly at 100 TB instead of
shuffling both sides.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.plans import count_exchanges, plan_string
from open_rust_timeseries_db_spark.sources.catalog import load_table
from open_rust_timeseries_db_spark.sources.warehouse import (
    co_located_join,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    write_bucketed(
        load_table(spark, SF_DIR, "orders"),
        lt,
        ["o_orderkey"],
        n_buckets=8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        rt,
        ["o_orderkey"],
        n_buckets=8,
        sort_cols=["o_orderkey"],
    )
    yield lt, rt
    spark.sql(f"DROP TABLE IF EXISTS {lt}")
    spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # Disable broadcast + AQE so the plan shows the raw SMJ strategy the
    # bucket layout enables (at 100 TB neither side is broadcastable).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = co_located_join(spark, lt, rt, on=["o_orderkey"])
        assert count_exchanges(joined) == 0, plan_string(joined, "simple")
        assert "SortMergeJoin" in plan_string(joined, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bucketed_join_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = co_located_join(spark, lt, rt, on=["o_orderkey"])
    plain = load_table(spark, SF_DIR, "orders").join(
        load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        "o_orderkey",
    )
    assert joined.count() == plain.count()
    got = joined.agg(F.sum("l_quantity")).collect()[0][0]
    want = plain.agg(F.sum("l_quantity")).collect()[0][0]
    assert got == want


def test_bucketed_groupby_reuses_layout(spark, bucketed_tables):
    """Aggregation on the bucket key also needs no shuffle."""
    _, rt = bucketed_tables
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        agg = spark.table(rt).groupBy("o_orderkey").agg(F.sum("l_quantity"))
        assert count_exchanges(agg) == 0, plan_string(agg, "simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
