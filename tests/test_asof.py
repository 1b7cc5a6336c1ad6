"""as-of join edge cases: ties, no-prior-match, left vs inner, duplicate
right timestamps with tiebreak — checked against hand-computed truth."""

from __future__ import annotations

from pyspark.sql import types as T

from open_rust_timeseries_db_spark.operators.asof import asof_join

L_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("lts", T.LongType()),
        T.StructField("tag", T.StringType()),
    ]
)
R_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("rts", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _run(spark, left_rows, right_rows, how="inner", tiebreak=None):
    left = spark.createDataFrame(left_rows, L_SCHEMA)
    right = spark.createDataFrame(right_rows, R_SCHEMA)
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_values=["v"], how=how, tiebreak=tiebreak,
    )
    return {(r["k"], r["lts"]): (r["asof_ts"], r["asof_v"]) for r in out.collect()}


def test_basic_backward_match(spark):
    got = _run(
        spark,
        [(1, 100, "a"), (1, 200, "b"), (1, 50, "c")],
        [(1, 90, 9.0, 1), (1, 150, 15.0, 2)],
    )
    assert got == {(1, 100): (90, 9.0), (1, 200): (150, 15.0)}  # (1,50) dropped


def test_tie_includes_equal_timestamp(spark):
    """left_ts == right_ts must match (>= semantics, like DuckDB ASOF)."""
    got = _run(spark, [(1, 100, "a")], [(1, 100, 10.0, 1)])
    assert got == {(1, 100): (100, 10.0)}


def test_left_join_keeps_unmatched(spark):
    got = _run(
        spark,
        [(1, 100, "a"), (2, 100, "b")],
        [(1, 90, 9.0, 1)],
        how="left",
    )
    assert got[(1, 100)] == (90, 9.0)
    assert got[(2, 100)] == (None, None)


def test_keys_do_not_leak_across_groups(spark):
    got = _run(
        spark,
        [(1, 100, "a"), (2, 100, "b")],
        [(1, 90, 9.0, 1), (2, 95, 95.0, 2)],
    )
    assert got == {(1, 100): (90, 9.0), (2, 100): (95, 95.0)}


def test_duplicate_right_ts_deterministic_with_tiebreak(spark):
    """Two right rows at the same ts: the greatest tiebreak wins."""
    got = _run(
        spark,
        [(1, 100, "a")],
        [(1, 90, 1.0, 1), (1, 90, 2.0, 2)],
        tiebreak="seq",
    )
    assert got == {(1, 100): (90, 2.0)}


def _run_fwd(spark, left_rows, right_rows, how="inner", tiebreak=None):
    left = spark.createDataFrame(left_rows, L_SCHEMA)
    right = spark.createDataFrame(right_rows, R_SCHEMA)
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_values=["v"], how=how, tiebreak=tiebreak,
        direction="forward",
    )
    return {(r["k"], r["lts"]): (r["asof_ts"], r["asof_v"]) for r in out.collect()}


def test_forward_nearest_following(spark):
    got = _run_fwd(
        spark,
        [(1, 100, "a"), (1, 200, "b"), (1, 500, "c")],
        [(1, 150, 15.0, 1), (1, 300, 30.0, 2)],
    )
    # 100 -> 150 (nearest future), 200 -> 300, 500 has no future: dropped
    assert got == {(1, 100): (150, 15.0), (1, 200): (300, 30.0)}


def test_forward_equal_timestamp_matches(spark):
    """left_ts == right_ts must match (<= semantics)."""
    got = _run_fwd(spark, [(1, 100, "a")], [(1, 100, 10.0, 1)])
    assert got == {(1, 100): (100, 10.0)}


def test_forward_left_keeps_unmatched(spark):
    got = _run_fwd(
        spark, [(1, 100, "a"), (1, 900, "z")], [(1, 150, 15.0, 1)], how="left"
    )
    assert got == {(1, 100): (150, 15.0), (1, 900): (None, None)}


def test_forward_duplicate_right_ts_tiebreak(spark):
    """Equal future right timestamps: greatest tiebreak wins (same rule
    as backward)."""
    got = _run_fwd(
        spark,
        [(1, 100, "a")],
        [(1, 200, 1.0, 1), (1, 200, 2.0, 2)],
        tiebreak="seq",
    )
    assert got == {(1, 100): (200, 2.0)}


def test_null_keys_match_across_strategies(spark):
    """NULL join keys group together in the window strategy (nulls
    match each other in partitionBy); the broadcast probe must treat
    them identically (eqNullSafe) or strategy='auto' silently changes
    results across the size cutover."""
    left = spark.createDataFrame([(None, 5), (1, 5)], "k int, lts int")
    right = spark.createDataFrame(
        [(None, 3, 10.0), (1, 3, 20.0)], "k int, rts int, px double"
    )
    results = {}
    for strategy in ("window", "broadcast"):
        out = asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_values=["px"], how="left", strategy=strategy,
        )
        results[strategy] = sorted(
            ((r["k"], r["lts"], r["asof_ts"], r["asof_px"]) for r in out.collect()),
            key=str,
        )
    assert results["window"] == results["broadcast"]
    assert (None, 5, 3, 10.0) in results["window"]
