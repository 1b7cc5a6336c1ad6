"""Hypothesis property tests for exact nearest-rank percentiles.

Both strategies of operators/percentiles.py — the single-task window
plan and the binned two-pass selection — must agree with a brute-force
python sort + round(p*(n-1)) index (the reference's formula,
src/tests/integration_test.rs:359-364) over random value multisets:
heavy duplicate runs, negative values, sub-integer spacing, huge
outliers that stretch the bin range, and values straddling bin
boundaries. The edge tests in test_percentile_guard.py pin known
corners; this sweeps the space between them.
"""

from __future__ import annotations

import decimal

from hypothesis import given, settings, strategies as st

import open_rust_timeseries_db_spark.operators.percentiles as pct

# Values from a small lattice (forces duplicate runs) scaled by a mix
# of magnitudes (forces wide bin ranges + denormal-ish spacing).
_vals = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.sampled_from([1.0, 0.125, 1e6, 1e12]),
    ).map(lambda t: t[0] * t[1]),
    min_size=1,
    max_size=60,
)
_ps = st.lists(
    st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0]),
    min_size=1,
    max_size=4,
    unique=True,
)


def _expected(vals: list[float], p: float) -> float:
    s = sorted(vals)
    # Spark F.round is HALF_UP, not banker's.
    r = int(
        decimal.Decimal(p * (len(s) - 1)).quantize(
            decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP
        )
    )
    return s[r]


@given(vals=_vals, ps=_ps)
@settings(max_examples=25, deadline=None)
def test_both_strategies_match_bruteforce(spark, vals, ps):
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    percentiles = [(f"p{i}", p) for i, p in enumerate(ps)]
    for strategy in ("window", "binned"):
        row = pct.nearest_rank_percentiles(
            df, "v", percentiles, strategy=strategy
        ).collect()[0]
        for name, p in percentiles:
            assert row[name] == _expected(vals, p), (strategy, p, vals)


@given(vals=_vals)
@settings(max_examples=15, deadline=None)
def test_grouped_form_matches_bruteforce(spark, vals):
    rows = [(i % 3, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k int, v double")
    got = {
        r["k"]: r
        for r in pct.nearest_rank_percentiles_by(
            df, "k", "v", [("p50", 0.5), ("p99", 0.99)]
        ).collect()
    }
    for k in {r[0] for r in rows}:
        sub = [v for kk, v in rows if kk == k]
        assert got[k]["p50"] == _expected(sub, 0.5), (k, sub)
        assert got[k]["p99"] == _expected(sub, 0.99), (k, sub)
        assert got[k]["n"] == len(sub)
