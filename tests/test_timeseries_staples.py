"""Brute-force Python references for the round-11 timeseries staples.

The oracle-parity suite proves Spark == DuckDB; these tests prove both
equal an INDEPENDENT straight-line Python implementation of each
operator's definition (per-group loops over the sorted samples), so a
bug shared by the two SQL formulations cannot self-certify. Exactness
is bit-level where the query promises it: the EWMA fold and the CUSUM
walk replay the identical IEEE/integer sequence in Python.
"""

from __future__ import annotations

import math

import pandas as pd

from open_rust_timeseries_db_spark.queries import all_queries
from tests.conftest import SF_DIR

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000
_HEARTBEAT_US = 1_800_000_000
_ALPHA = 0.3

QS = all_queries()


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    # canonical epoch-µs, whatever unit the file/pandas lands on
    ts_us = ev["ts"].astype("datetime64[us]").astype("int64")
    return pd.DataFrame(
        {
            "user_id": ev["user_id"].astype("int64"),
            "event_type": ev["event_type"],
            "ts_us": ts_us,
            "ord": ts_us * 1000 + ev["event_id"].astype("int64") % 1000,
            "value": ev["value"].astype("float64"),
        }
    )


def _spark_rows(spark, name):
    df = QS[name].fn(spark, SF_DIR)
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    ), cols


def test_ewma_matches_python_recurrence(spark):
    ev = _events()
    ev["day_bucket"] = ev["ts_us"] // _DAY_US
    expected = {}
    for (uid, day), grp in ev.groupby(["user_id", "day_bucket"]):
        vals = grp.sort_values("ord")["value"].tolist()
        acc = vals[0]
        for x in vals[1:]:
            # identical IEEE sequence to the query's fold
            acc = _ALPHA * x + (1 - _ALPHA) * acc
        expected[(uid, day)] = (len(vals), acc)
    got, cols = _spark_rows(spark, "q_ewma_smooth")
    assert cols == ["day_bucket", "ewma", "n_samples", "user_id"]
    assert len(got) == len(expected)
    for day, ewma, n, uid in got:
        exp_n, exp_ewma = expected[(uid, day)]
        assert n == exp_n
        assert ewma == exp_ewma, (uid, day, ewma, exp_ewma)


def test_cusum_matches_integer_walk(spark):
    ev = _events()
    ev["day_bucket"] = ev["ts_us"] // _DAY_US
    expected = {}
    for (uid, day), grp in ev.groupby(["user_id", "day_bucket"]):
        grp = grp.sort_values("ord")
        xs = [int(math.floor(v * 1_000_000 + 0.5)) for v in grp["value"]]
        ords = grp["ord"].tolist()
        n, sx = len(xs), sum(xs)
        prefix, run_min, best, best_ord = 0, 0, None, None
        walk_prev_min = None
        for t, (x, o) in enumerate(zip(xs, ords), start=1):
            prefix += x
            walk = n * prefix - t * sx
            walk_prev_min = (
                walk if walk_prev_min is None else min(walk_prev_min, walk)
            )
            drawup = walk - walk_prev_min
            if best is None or drawup > best:
                best, best_ord = drawup, o
        stat = float(best) / (float(n) * 1_000_000.0)
        expected[(uid, day)] = (n, stat, best_ord)
    got, cols = _spark_rows(spark, "q_cusum_changepoint")
    assert cols == [
        "cp_ord",
        "cusum_stat",
        "day_bucket",
        "n_samples",
        "user_id",
    ]
    assert len(got) == len(expected)
    for cp_ord, stat, day, n, uid in got:
        exp_n, exp_stat, exp_ord = expected[(uid, day)]
        assert (n, cp_ord) == (exp_n, exp_ord), (uid, day)
        assert stat == exp_stat, (uid, day, stat, exp_stat)


def test_heartbeat_equals_true_interval_union(spark):
    """The query's sum(min(gap, L)) shortcut must equal a real
    sweep-line union of the [t, min(t+L, day_end)) liveness intervals
    — the claim in its docstring, checked against the honest
    implementation of the definition."""
    ev = _events()
    ev["day_bucket"] = ev["ts_us"] // _DAY_US
    expected = {}
    for (uid, day), grp in ev.groupby(["user_id", "day_bucket"]):
        day_end = (day + 1) * _DAY_US
        ivals = sorted(
            (t, min(t + _HEARTBEAT_US, day_end)) for t in grp["ts_us"]
        )
        covered, cur_lo, cur_hi = 0, None, None
        for lo, hi in ivals:
            if cur_hi is None or lo > cur_hi:
                if cur_hi is not None:
                    covered += cur_hi - cur_lo
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        covered += cur_hi - cur_lo
        ts_sorted = sorted(zip(grp["ts_us"], grp["ord"]))
        dead = sum(
            1
            for (a, _), (b, _) in zip(ts_sorted, ts_sorted[1:])
            if b - a > _HEARTBEAT_US
        )
        expected[(uid, day)] = (len(ivals), covered, dead)
    got, cols = _spark_rows(spark, "q_heartbeat_uptime")
    assert cols == [
        "day_bucket",
        "live_ratio",
        "live_us",
        "n_beats",
        "n_dead_gaps",
        "user_id",
    ]
    assert len(got) == len(expected)
    for day, ratio, live, n, dead, uid in got:
        exp_n, exp_live, exp_dead = expected[(uid, day)]
        assert (n, live, dead) == (exp_n, exp_live, exp_dead), (uid, day)
        assert ratio == live / float(_DAY_US)


def test_state_durations_bruteforce(spark):
    ev = _events()
    ev["day_bucket"] = ev["ts_us"] // _DAY_US
    totals: dict[str, int] = {}
    counts: dict[str, int] = {}
    for (_, day), grp in ev.groupby(["user_id", "day_bucket"]):
        grp = grp.sort_values("ord")
        ts = grp["ts_us"].tolist() + [(day + 1) * _DAY_US]
        for i, st in enumerate(grp["event_type"]):
            dur = ts[i + 1] - ts[i]
            totals[st] = totals.get(st, 0) + dur
            counts[st] = counts.get(st, 0) + 1
    got, cols = _spark_rows(spark, "q_state_durations")
    assert cols == ["avg_interval_us", "event_type", "n_intervals", "total_us"]
    assert len(got) == len(totals)
    for avg, st, n, total in got:
        assert (n, total) == (counts[st], totals[st]), st
        assert avg == float(totals[st]) / counts[st]


def test_m4_extremes_and_latest_point_bruteforce(spark):
    ev = _events()
    ev["bucket_hour"] = ev["ts_us"] // _HOUR_US
    m4 = {}
    for (uid, bh), grp in ev.groupby(["user_id", "bucket_hour"]):
        pairs = sorted(zip(grp["value"], grp["ord"]))
        m4[(uid, bh)] = (
            pairs[0][0],
            pairs[-1][0],
            pairs[0][1],
            pairs[-1][1],
            len(pairs),
        )
    got, cols = _spark_rows(spark, "q_m4_downsample")
    assert cols == [
        "bucket_hour",
        "max_ord",
        "min_ord",
        "n_points",
        "user_id",
        "v_max",
        "v_min",
    ]
    assert len(got) == len(m4)
    for bh, mx_o, mn_o, n, uid, vmax, vmin in got:
        assert (vmin, vmax, mn_o, mx_o, n) == m4[(uid, bh)], (uid, bh)

    latest = {}
    for uid, grp in ev.groupby("user_id"):
        row = grp.loc[grp["ord"].idxmax()]
        latest[uid] = (grp["ts_us"].max(), row["value"], len(grp))
    got, cols = _spark_rows(spark, "q_latest_point")
    assert cols == ["last_ts_us", "last_value", "n_ticks", "user_id"]
    assert len(got) == len(latest)
    for ts, val, n, uid in got:
        assert (ts, val, n) == latest[uid], uid


def test_max_drawdown_bruteforce(spark):
    ev = _events()
    expected = {}
    for uid, grp in ev.groupby("user_id"):
        vals = grp.sort_values("ord")["value"].tolist()
        peak, best = -math.inf, None
        for v in vals:
            peak = max(peak, v)
            if peak > 0:
                dd = (v - peak) / peak
                best = dd if best is None else min(best, dd)
        expected[uid] = (len(vals), peak, best)
    got, cols = _spark_rows(spark, "q_max_drawdown")
    assert cols == ["max_drawdown", "n_ticks", "peak_value", "user_id"]
    assert len(got) == len(expected)
    for dd, n, peak, uid in got:
        assert (n, peak, dd) == expected[uid], uid


def test_gapfill_null_hour_buckets(spark, tmp_path_factory):
    """A bucket whose avg_value is NULL (every event value NULL that
    hour) is a GAP under the oracle's IGNORE NULLS windows: LOCF must
    carry the prior value ACROSS it and interp must interpolate across
    it — not treat it as an observation boundary that NULLs the run.
    Shipped tiers carry no NULL values, so this pins the latent
    contract on a synthetic corpus: mid-run NULL hours, a leading NULL
    hour, a trailing NULL hour, and an all-NULL symbol."""
    import duckdb
    import numpy as np

    from open_rust_timeseries_db_spark.queries.timeseries import (
        q_gapfill_interp,
        q_gapfill_locf,
    )
    from tests.conftest import assert_frames_match

    rows = []  # (user_id, hour, value)
    rows += [(1, 0, 1.0), (1, 0, 3.0)]   # obs hour 0 (avg 2.0)
    rows += [(1, 2, None)]               # mid NULL hour
    rows += [(1, 5, 4.0)]                # obs hour 5
    rows += [(1, 7, None)]               # trailing NULL hour
    rows += [(2, 0, None)]               # leading NULL hour
    rows += [(2, 3, 6.0), (2, 8, 1.0)]   # obs hours 3 and 8
    rows += [(3, 1, None), (3, 6, None)] # all-NULL symbol
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype="int64"),
            "ts": pd.to_datetime(
                [h * 3_600_000_000 for _, h, _ in rows], unit="us"
            ).astype("datetime64[us]"),
            "user_id": np.array([u for u, _, _ in rows], dtype="int64"),
            "event_type": "t",
            "value": np.array(
                [v for _, _, v in rows], dtype="float64"
            ),
            "props": "{}",
        }
    )
    d = tmp_path_factory.mktemp("nullhours")
    pdf.to_parquet(d / "events.parquet", index=False)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    try:
        for spec_fn, name in (
            (q_gapfill_locf, "q_gapfill_locf"),
            (q_gapfill_interp, "q_gapfill_interp"),
        ):
            got = spec_fn(spark, str(d)).toPandas()
            want = con.sql(all_queries()[name].oracle).df()
            assert_frames_match(got, want, name=f"{name}-nullhours")
    finally:
        con.close()
