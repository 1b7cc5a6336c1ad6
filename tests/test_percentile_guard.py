"""The exact-percentile operator must refuse cluster-scale inputs.

``nearest_rank_percentiles`` funnels its global sort through one task
(reference semantics: sort + round(p*(n-1)) indexing,
src/tests/integration_test.rs:359-364); the scale contract is enforced
at runtime by a Catalyst size-estimate gate, not just a docstring.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import open_rust_timeseries_db_spark.operators.percentiles as pct


def _frame(spark):
    return spark.range(0, 1000).select(
        F.col("id").alias("tie"), (F.col("id") % 97).cast("double").alias("v")
    )


def test_exact_percentiles_under_budget(spark):
    out = pct.nearest_rank_percentiles(
        _frame(spark), "v", [("p50", 0.5), ("p99", 0.99)], tiebreak="tie"
    ).collect()[0]
    # 1000 rows of (id % 97): nearest-rank indexes round(p*999).
    vals = sorted((i % 97, i) for i in range(1000))
    assert out["p50"] == float(vals[round(0.5 * 999)][0])
    assert out["p99"] == float(vals[round(0.99 * 999)][0])


def test_exact_percentiles_refuse_over_budget(spark, monkeypatch):
    monkeypatch.setattr(pct, "EXACT_SORT_MAX_BYTES", 1)
    with pytest.raises(ValueError, match="exact-sort budget"):
        pct.nearest_rank_percentiles(
            _frame(spark), "v", [("p50", 0.5)], tiebreak="tie"
        )


def test_size_estimate_is_sane(spark):
    est = pct._estimated_size_bytes(_frame(spark))
    # 1000 narrow rows: a real positive estimate far below the budget.
    assert 0 < est < pct.EXACT_SORT_MAX_BYTES


def test_unestimable_input_not_gated(spark, monkeypatch):
    # LogicalRDD leaves have no Catalyst size estimate — they report
    # spark.sql.defaultSizeInBytes (Long.MaxValue stock), and joins
    # MULTIPLY child estimates, so bogus sizes propagate upward. Those
    # must read as "unknown" (gate skipped), not trip the budget and
    # raise on a public API.
    monkeypatch.setattr(pct, "EXACT_SORT_MAX_BYTES", 1)
    rdd = spark.sparkContext.parallelize(
        [(float(i % 97), i) for i in range(100)]
    )
    df = spark.createDataFrame(rdd, "v double, tie long")
    assert pct._estimated_size_bytes(df.select("v", "tie")) == -1
    out = pct.nearest_rank_percentiles(
        df, "v", [("p50", 0.5)], tiebreak="tie"
    ).collect()[0]
    vals = sorted((i % 97, i) for i in range(100))
    assert out["p50"] == float(vals[round(0.5 * 99)][0])


def test_unestimable_input_projected_narrow_not_gated(spark, monkeypatch):
    # Catalyst SCALES the bogus Long.MaxValue leaf estimate by the
    # projection's column-width ratio, so selecting 2 of 3 columns
    # lands the estimate BELOW defaultSizeInBytes while still being
    # absurd (~3.35e18 "bytes" for 100 rows). The sanity ceiling must
    # catch it; without it this raised ValueError on a 100-row frame.
    monkeypatch.setattr(pct, "EXACT_SORT_MAX_BYTES", 1)
    rdd = spark.sparkContext.parallelize(
        [(float(i % 97), i, f"pad{i}") for i in range(100)]
    )
    df = spark.createDataFrame(rdd, "v double, tie long, extra string")
    assert pct._estimated_size_bytes(df.select("v", "tie")) == -1
    out = pct.nearest_rank_percentiles(
        df, "v", [("p50", 0.5)], tiebreak="tie"
    ).collect()[0]
    vals = sorted((i % 97, i) for i in range(100))
    assert out["p50"] == float(vals[round(0.5 * 99)][0])


def test_unestimable_join_product_not_gated(spark, monkeypatch):
    # A join above an unestimable leaf inherits (multiplies) the bogus
    # estimate; the guard must treat the whole plan as unknown.
    monkeypatch.setattr(pct, "EXACT_SORT_MAX_BYTES", 1)
    rdd = spark.sparkContext.parallelize([(float(i), i % 5) for i in range(50)])
    left = spark.createDataFrame(rdd, "v double, k int")
    right = spark.range(5).select(F.col("id").cast("int").alias("k"))
    joined = left.join(right, "k").select("v")
    assert pct._estimated_size_bytes(joined) == -1
    out = pct.nearest_rank_percentiles(joined, "v", [("p50", 0.5)]).collect()[0]
    # Spark F.round is HALF_UP: round(0.5 * 49) = 25 (not banker's 24).
    assert out["p50"] == float(sorted(float(i) for i in range(50))[25])


def test_grouped_variant_not_gated(spark, monkeypatch):
    # The per-key form sorts within key partitions (parallel) and must
    # stay usable past the global budget.
    monkeypatch.setattr(pct, "EXACT_SORT_MAX_BYTES", 1)
    df = _frame(spark).withColumn("k", (F.col("tie") % 2).cast("int"))
    rows = pct.nearest_rank_percentiles_by(
        df, "k", "v", [("p50", 0.5)], tiebreak="tie"
    ).collect()
    assert len(rows) == 2
