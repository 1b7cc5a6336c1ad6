"""Hypothesis property test for the as-of join vs a naive reference.

operators/asof.py composes the join from a union + per-key window
(never a range crossJoin); the edge tests in test_asof.py pin known
corners, and this property sweeps random key/timestamp layouts —
duplicate timestamps on both sides, keys present on one side only,
both directions, inner and left — against a per-row linear-scan
reference.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from open_rust_timeseries_db_spark.operators.asof import (
    asof_join,
    asof_join_same_source,
)

_key = st.integers(min_value=0, max_value=2)
_ts = st.integers(min_value=0, max_value=20)
# Null timestamps on BOTH sides: a null right_ts row must never match
# anything (both strategies drop them identically), and a null left_ts
# row must never find a match — the broadcast probe's array-count
# indexing is the path that historically misindexed here.
_ts_n = st.one_of(st.none(), _ts)


@st.composite
def sides(draw):
    left = draw(st.lists(st.tuples(_key, _ts_n), min_size=0, max_size=12))
    right = draw(st.lists(st.tuples(_key, _ts_n), min_size=0, max_size=12))
    # Unique (key, ts) on the right so the match is well-defined
    # without a tiebreak column (the tiebreak path has its own tests).
    right = sorted(set(right), key=lambda t: (t[0], t[1] is None, t[1] or 0))
    return left, right


def _naive(left, right, direction, how):
    out = []
    for lk, lt in left:
        if lt is None:
            cands = []
        elif direction == "backward":
            cands = [
                (rt, rv)
                for rk, rt, rv in right
                if rk == lk and rt is not None and rt <= lt
            ]
        else:
            cands = [
                (rt, rv)
                for rk, rt, rv in right
                if rk == lk and rt is not None and rt >= lt
            ]
        if direction == "backward":
            best = max(cands) if cands else None
        else:
            best = min(cands) if cands else None
        if best is not None:
            out.append((lk, lt, best[0], best[1]))
        elif how == "left":
            out.append((lk, lt, None, None))
    return sorted(
        out,
        key=lambda r: (r[0], r[1] is None, r[1] or 0, r[2] is None, r[2] or 0),
    )


@settings(max_examples=25, deadline=None)
@given(
    data=sides(),
    direction=st.sampled_from(["backward", "forward"]),
    how=st.sampled_from(["inner", "left"]),
    # Both physical strategies must match the linear scan: the
    # union+window any-size shape AND the broadcast-probe shape
    # (per-key sorted right arrays, codegen'd HOF probe).
    strategy=st.sampled_from(["window", "broadcast"]),
)
def test_asof_join_matches_linear_scan(spark, data, direction, how, strategy):
    left_rows, right_rows = data
    # Null-ts right rows still carry a NON-null px: the historical
    # window-path leak attached such a row's value columns while
    # leaving asof_ts null, so a sentinel value here catches it.
    right_rows = [(k, t, k * 100 + (t if t is not None else 99)) for k, t in right_rows]
    left = spark.createDataFrame(
        left_rows or [(None, None)], "k int, lts int"
    )
    if not left_rows:
        left = left.filter("k IS NOT NULL")
    right = spark.createDataFrame(
        right_rows or [(None, None, None)], "k int, rts int, px int"
    )
    if not right_rows:
        right = right.filter("k IS NOT NULL")
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_values=["px"], how=how, direction=direction,
        strategy=strategy,
    )
    got = sorted(
        (
            (r["k"], r["lts"], r["asof_ts"], r["asof_px"])
            for r in out.collect()
        ),
        key=lambda r: (r[0], r[1] is None, r[1] or 0, r[2] is None, r[2] or 0),
    )
    # The naive reference attaches one match per left ROW; duplicate
    # left rows therefore appear once per occurrence in both.
    assert got == _naive(left_rows, right_rows, direction, how)


@settings(max_examples=25, deadline=None)
@given(
    data=sides(),
    direction=st.sampled_from(["backward", "forward"]),
    how=st.sampled_from(["inner", "left"]),
)
def test_asof_same_source_matches_linear_scan(spark, data, direction, how):
    """The single-scan tagged variant (asof_join_same_source) must pick
    the same matches as the two-sided operator for disjoint row
    subsets of one DataFrame — including null keys, null timestamps on
    either side, and keys present on one side only."""
    from pyspark.sql import functions as F

    left_rows, right_rows = data
    right_rows = [(k, t, k * 100 + (t if t is not None else 99)) for k, t in right_rows]
    rows = [(k, t, None, "L") for k, t in left_rows] + [
        (k, t, px, "R") for k, t, px in right_rows
    ]
    df = spark.createDataFrame(
        rows or [(None, None, None, None)], "k int, ts int, px int, side string"
    )
    if not rows:
        df = df.filter("side IS NOT NULL")
    out = asof_join_same_source(
        df,
        on="k",
        ts="ts",
        left_pred=F.col("side") == "L",
        right_pred=F.col("side") == "R",
        left_cols=[],
        right_values=["px"],
        how=how,
        direction=direction,
    )
    got = sorted(
        ((r["k"], r["ts"], r["asof_ts"], r["asof_px"]) for r in out.collect()),
        key=lambda r: (r[0], r[1] is None, r[1] or 0, r[2] is None, r[2] or 0),
    )
    assert got == _naive(left_rows, right_rows, direction, how)
