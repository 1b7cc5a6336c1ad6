"""Format IO roundtrips: parquet/csv/json writers land exactly what the
readers (declared schemas, FAILFAST) get back."""

from __future__ import annotations

from open_rust_timeseries_db_spark.sources.catalog import TABLES, load_table
from open_rust_timeseries_db_spark.sources.io import (
    read_csv,
    read_json,
    write_csv,
    write_json,
    write_parquet,
)

SF_DIR = "/root/testdata/sf0.001"


def _sum_long(df, col):
    from pyspark.sql import functions as F

    return df.agg(F.sum(F.col(col))).collect()[0][0]


def test_csv_roundtrip_events(spark, tmp_path):
    src = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_csv")
    write_csv(src, path)
    back = read_csv(spark, path, "events")
    assert back.count() == src.count()
    assert _sum_long(back, "event_id") == _sum_long(src, "event_id")
    from pyspark.sql import functions as F

    # ts is epoch-nanos ~1.7e18: summing overflows long; compare extremes.
    got = back.agg(F.min("ts"), F.max("ts")).collect()[0]
    want = src.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert tuple(got) == tuple(want)


def test_json_roundtrip_events(spark, tmp_path):
    src = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_json")
    write_json(src, path)
    back = read_json(spark, path, "events")
    assert back.count() == src.count()
    assert _sum_long(back, "user_id") == _sum_long(src, "user_id")


def test_partitioned_parquet_prunes(spark, tmp_path):
    """partitionBy columns must show up as PartitionFilters, not data
    filters — that's partition pruning doing the 100 TB work."""
    from open_rust_timeseries_db_spark.plans import plan_string

    src = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_part")
    write_parquet(src, path, partition_by=["event_type"])
    back = spark.read.schema(TABLES["events"]).parquet(path)
    filtered = back.filter(back.event_type == "click")
    plan = plan_string(filtered)
    assert "PartitionFilters" in plan
    assert "isnotnull(event_type" in plan or "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    src_clicks = src.filter(src.event_type == "click").count()
    assert filtered.count() == src_clicks


def test_orc_roundtrip_events(spark, tmp_path):
    """ORC write -> declared-schema read must be lossless (the second
    columnar lake format; stripe-stat pushdown comes free)."""
    from open_rust_timeseries_db_spark.sources.io import read_orc, write_orc

    src = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_orc")
    write_orc(src, path)
    back = read_orc(spark, path, "events")
    assert back.schema == src.schema
    assert back.count() == src.count()
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b
