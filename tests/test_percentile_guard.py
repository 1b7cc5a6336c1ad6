"""Exact percentiles must scale past the single-task sort budget.

``nearest_rank_percentiles`` (reference semantics: sort +
round(p*(n-1)) indexing, src/tests/integration_test.rs:359-364) has two
size-gated strategies: a minimal-stage single-task window for in-memory
inputs, and binned two-pass selection past the budget (or when the size
is unknown) — every row-level pass fully parallel, the only serial
window over the bounded bin histogram. These tests pin (a) exactness of
BOTH strategies against a brute-force python sort across adversarial
shapes — duplicates, constants, negatives, floats, bin-boundary
clusters — (b) strategy equality, and (c) the binned plan shape: no
SinglePartition exchange feeding a Sort/Window whose input is raw rows
rather than a pre-aggregated histogram.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import open_rust_timeseries_db_spark.operators.percentiles as pct

PCTS = [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]


def _expected(vals: list[float], p: float) -> float:
    s = sorted(vals)
    # Spark F.round is HALF_UP (not banker's): round(0.5) -> 1.
    import decimal

    r = int(
        decimal.Decimal(p * (len(s) - 1)).quantize(
            decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP
        )
    )
    return s[r]


@pytest.mark.parametrize(
    "vals",
    [
        [float(i % 97) for i in range(1000)],  # heavy duplicates
        [float(i) for i in range(1000)],  # all distinct
        [1.0] * 500,  # constant column (hi == lo)
        [float(-i) for i in range(333)],  # negatives
        [0.0] * 999 + [1e12],  # outlier stretches the bin range
        [float(i) / 7.0 for i in range(1, 100)],  # non-integer doubles
    ],
)
def test_binned_selection_matches_bruteforce(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    for strategy in ("window", "binned"):
        out = pct.nearest_rank_percentiles(
            df, "v", PCTS, strategy=strategy
        ).collect()[0]
        for name, p in PCTS:
            assert out[name] == _expected(vals, p), (strategy, name, p)


def test_bigint_values_exact(spark):
    # Integer columns bin through double arithmetic (monotone, maybe
    # lossy) but select on the ORIGINAL values — the answer is exact.
    vals = [10**15 + i for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    out = pct.nearest_rank_percentiles(df, "v", PCTS).collect()[0]
    for name, p in PCTS:
        assert out[name] == _expected(vals, p), (name, p)


def test_nulls_ignored_and_empty_input(spark):
    df = spark.createDataFrame(
        [(None,), (2.0,), (1.0,), (None,), (3.0,)], "v double"
    )
    out = pct.nearest_rank_percentiles(df, "v", [("p50", 0.5)]).collect()[0]
    assert out["p50"] == 2.0
    empty = df.filter(F.col("v") > 100.0)
    row = pct.nearest_rank_percentiles(empty, "v", [("p50", 0.5)]).collect()
    assert len(row) == 1 and row[0]["p50"] is None


def test_nan_sorts_last(spark):
    # Spark's total order puts NaN greatest; the top-bin NaN routing
    # must reproduce that, not poison the bin arithmetic.
    vals = [1.0, 2.0, 3.0, 4.0, float("nan")]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = pct.nearest_rank_percentiles(
        df, "v", [("p50", 0.5), ("p100", 1.0)]
    ).collect()[0]
    # n=5: r(0.5) = round(0.5*4)+1 = 3 -> third of [1,2,3,4,NaN].
    assert out["p50"] == 3.0
    assert str(out["p100"]) == "nan"


def test_non_numeric_falls_back_to_distinct_histogram(spark):
    df = spark.createDataFrame(
        [(c,) for c in "dacbe"], "v string"
    )
    out = pct.nearest_rank_percentiles(df, "v", [("p50", 0.5)]).collect()[0]
    assert out["p50"] == "c"


def test_unestimable_input_runs(spark):
    # LogicalRDD leaves have no Catalyst size estimate; the old
    # operator gated on it. The binned path has nothing to gate —
    # arbitrary inputs just run.
    rdd = spark.sparkContext.parallelize(
        [(float(i % 97), i) for i in range(100)]
    )
    df = spark.createDataFrame(rdd, "v double, tie long")
    out = pct.nearest_rank_percentiles(
        df, "v", [("p50", 0.5)], tiebreak="tie"
    ).collect()[0]
    vals = sorted(i % 97 for i in range(100))
    assert out["p50"] == float(vals[round(0.5 * 99)])


def test_binned_no_single_task_sort_over_raw_rows(spark):
    """The binned strategy's plan contract: every SinglePartition
    exchange feeding a Sort/Window must sit ABOVE a HashAggregate
    (i.e. sees a bounded histogram, never raw rows). The window
    strategy exchanges the full row set into one sort task — which is
    why "auto" refuses it past IN_MEMORY_SORT_MAX_BYTES."""
    df = spark.range(0, 10_000).select(
        (F.col("id") % 997).cast("double").alias("v")
    )
    plan = (
        pct.nearest_rank_percentiles(df, "v", PCTS, strategy="binned")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Indented tree: for each "Exchange SinglePartition" line, the
    # nearest more-indented subtree below it must contain a
    # HashAggregate before any leaf scan.
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        depth = len(line) - len(line.lstrip(" +-:*("))
        subtree = []
        for below in lines[i + 1 :]:
            d = len(below) - len(below.lstrip(" +-:*("))
            if d <= depth and below.strip():
                break
            subtree.append(below)
        assert any("HashAggregate" in s for s in subtree), (
            "SinglePartition exchange over raw rows:\n" + plan
        )


def test_grouped_variant_ignores_null_values(spark):
    """nearest_rank_percentiles_by must honor the same nulls-ignored
    contract as the global operator: null values must not inflate the
    per-key count, shift ranks, or surface as a percentile."""
    df = spark.createDataFrame(
        [(0, None), (0, None), (0, 1.0), (0, 2.0), (0, 3.0), (1, None)],
        "k int, v double",
    )
    rows = pct.nearest_rank_percentiles_by(
        df, "k", "v", [("p50", 0.5)]
    ).collect()
    got = {r["k"]: r["p50"] for r in rows}
    # Key 0: p50 over (1,2,3) = 2.0 — unshifted by the two nulls.
    # Key 1: all-null -> no non-null histogram rows -> key absent,
    # never a null percentile.
    assert got == {0: 2.0}


def test_grouped_variant_parallel_by_key(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("tie"),
        (F.col("id") % 97).cast("double").alias("v"),
        (F.col("id") % 2).cast("int").alias("k"),
    )
    rows = pct.nearest_rank_percentiles_by(
        df, "k", "v", [("p50", 0.5)], tiebreak="tie"
    ).collect()
    assert len(rows) == 2
    for row in rows:
        vals = [float(i % 97) for i in range(1000) if i % 2 == row["k"]]
        assert row["p50"] == _expected(vals, 0.5)
