"""Overflow-safety of the two-phase fixed-point aggregation shape.

Round-4 advice: single-phase BIGINT micro-unit sums wrap silently once a
group's value-sum crosses 2^63/1e6 ~ 9.2e12 (a lineitem grand-total row
reaches that around sf40-100). The rollup/cube/pivot family now keys
BIGINT partials by spark_partition_id() (bounded by one input split)
and re-sums them in DECIMAL(38,0) via helpers.fx_resum. This test
constructs a group whose value-sum EXCEEDS the single-phase wrap point
and pins that (a) the naive single-phase sum actually wraps (the hazard
is real) and (b) the two-phase shape returns the exact total.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.queries.helpers import _scaled_long, fx_resum

# 2,000 rows x 9e9 per row = 1.8e13 in value units = 1.8e19 micro-units,
# past the 2^63 ~ 9.22e18 BIGINT wrap. Per-row _scaled_long stays exact
# (9e9 * 1e6 = 9e15 << 2^53... 9e15 < 9.007e15 = 2^53, at the bound's
# edge by design).
_N_ROWS = 2_000
_ROW_VALUE = 9.0e9


def test_single_phase_bigint_sum_fails(spark):
    """The hazard is real: a single-phase BIGINT sum over this group
    cannot produce the right answer — under Spark 4's default ANSI mode
    it raises ARITHMETIC_OVERFLOW (fail-loud), and with ANSI off it
    wraps negative (fail-silent). Either way, not the exact total the
    two-phase shape returns."""
    import pytest

    df = spark.range(_N_ROWS).select(F.lit(_ROW_VALUE).alias("v"))
    agg = df.agg(
        (F.sum(_scaled_long(F.col("v"))).cast("double") / F.lit(1e6)).alias("s")
    )
    exact = _N_ROWS * _ROW_VALUE
    try:
        wrapped = agg.first()["s"]
    except Exception as exc:  # ANSI mode: loud overflow
        assert "OVERFLOW" in str(exc).upper() or "overflow" in str(exc)
        return
    # Non-ANSI: silent wrap — anything but the exact value.
    assert wrapped is None or wrapped < 0 or abs(wrapped - exact) > 1e9


def test_two_phase_pid_partials_are_exact(spark):
    df = (
        spark.range(_N_ROWS)
        .repartition(8)  # several splits => several partials per group
        .select(F.lit("g").alias("k"), F.lit(_ROW_VALUE).alias("v"))
    )
    partials = df.groupBy(
        "k", F.spark_partition_id().alias("pid")
    ).agg(F.sum(_scaled_long(F.col("v"))).alias("p_fx"))
    got = (
        partials.rollup("k")
        .agg(fx_resum("p_fx").alias("s"))
        .filter(F.col("k").isNull())  # the grand-total row
        .first()["s"]
    )
    assert got == _N_ROWS * _ROW_VALUE
