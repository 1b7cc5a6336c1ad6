"""Brute-force Python references for the round-12 indicator staples.

Same triangulation contract as tests/test_timeseries_staples.py: the
oracle-parity suite proves Spark == DuckDB; these prove both equal an
INDEPENDENT straight-line Python implementation (per-group loops over
sorted samples), so a bug shared by the two SQL formulations cannot
self-certify. Floats are compared EXACTLY where the query promises
bit-exactness — every reference replays the query's documented IEEE
sequence (fixed-point integer sums, then the same cast/divide order).
"""

from __future__ import annotations

import math

import pandas as pd

from open_rust_timeseries_db_spark.queries import all_queries
from tests.conftest import SF_DIR

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000
_MAD_K = 4.4478

QS = all_queries()


def _fx(v: float) -> int:
    return int(math.floor(v * 1_000_000 + 0.5))


def _nearest_rank(sorted_vals: list) -> int:
    """1-based nearest rank for p=0.5 (HALF-UP, the registry's ROUND)."""
    n = len(sorted_vals)
    return int(math.floor(0.5 * (n - 1) + 0.5)) + 1


def _rank_at(sorted_vals: list, p: float):
    n = len(sorted_vals)
    r = int(math.floor(p * (n - 1) + 0.5)) + 1
    return sorted_vals[r - 1]


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ts_us = ev["ts"].astype("datetime64[us]").astype("int64")
    return pd.DataFrame(
        {
            "user_id": ev["user_id"].astype("int64"),
            "event_id": ev["event_id"].astype("int64"),
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


def test_rsi_matches_python_walk(spark):
    ev = _events()
    expected = []
    for uid, grp in ev.groupby("user_id"):
        grp = grp.sort_values("ord")
        vfx = [_fx(v) for v in grp["value"]]
        rows = list(zip(grp["ts_us"], grp["value"]))
        deltas = [None] + [vfx[i] - vfx[i - 1] for i in range(1, len(vfx))]
        for i in range(len(vfx)):
            win = [d for d in deltas[max(0, i - 13): i + 1] if d is not None]
            if len(win) != 14:
                continue
            sg = sum(d for d in win if d > 0)
            sl = sum(-d for d in win if d < 0)
            if sg + sl <= 0:
                continue
            rsi = 100.0 * (float(sg) / float(sg + sl))
            if rsi >= 70 or rsi <= 30:
                ts, v = rows[i]
                expected.append((rsi, ts, uid, v))
    got, cols = _spark_rows(spark, "q_rsi")
    assert cols == ["rsi", "ts_us", "user_id", "value"]
    assert got == sorted(expected)


def test_bollinger_matches_python_walk(spark):
    ev = _events()
    ev["bucket_hour"] = ev["ts_us"] // _HOUR_US
    expected = []
    for uid, grp in ev.groupby("user_id"):
        bars: dict[int, tuple[int, int]] = {}
        for _, r in grp.iterrows():
            k = int(r["bucket_hour"])
            cand = (int(r["ord"]), _fx(r["value"]))
            if k not in bars or cand[0] > bars[k][0]:
                bars[k] = cand
        hours = sorted(bars)
        closes = [float(bars[h][1]) / 1_000_000.0 for h in hours]
        for i, h in enumerate(hours):
            lo = max(0, i - 23)
            win = closes[lo: i + 1]
            n = len(win)
            if n < 12:
                continue
            sx = float(sum(_fx(c) for c in win)) / 1_000_000.0
            sxx = float(
                sum(int(math.floor(c * c * 1_000_000 + 0.5)) for c in win)
            ) / 1_000_000.0
            mid = sx / n
            var_v = sxx / n - mid * mid
            if var_v <= 1e-9:
                continue
            sd2 = 2 * math.sqrt(var_v)
            close = closes[i]
            pct_b = (close - (mid - sd2)) / (4 * math.sqrt(var_v))
            expected.append(
                (h, close, mid - sd2, mid, pct_b, mid + sd2, uid)
            )
    got, cols = _spark_rows(spark, "q_bollinger_bands")
    assert cols == [
        "bucket_hour", "close", "lower", "mid", "pct_b", "upper", "user_id",
    ]
    assert got == sorted(expected)


def test_rolling_wau_matches_python_sets(spark):
    ev = _events()
    ev["day"] = ev["ts_us"] // _DAY_US
    pairs = set(zip(ev["user_id"], ev["day"]))
    days = sorted({d for _, d in pairs})
    expected = sorted(
        (d, len({u for (u, ud) in pairs if d - 6 <= ud <= d}))
        for d in days
    )
    got, cols = _spark_rows(spark, "q_rolling_wau")
    assert cols == ["day_bucket", "wau"]
    assert got == expected


def test_anomaly_mad_matches_python_selection(spark):
    ev = _events()
    expected = []
    for uid, grp in ev.groupby("user_id"):
        vals = sorted(grp["value"])
        med = vals[_nearest_rank(vals) - 1]
        adevs = sorted(abs(v - med) for v in grp["value"])
        mad = adevs[_nearest_rank(adevs) - 1]
        if mad <= 0:
            continue
        for _, r in grp.iterrows():
            adev = abs(r["value"] - med)
            if adev > _MAD_K * mad:
                expected.append((mad, med, r["ts_us"], uid, r["value"]))
    got, cols = _spark_rows(spark, "q_anomaly_mad")
    assert cols == ["mad", "med", "ts_us", "user_id", "value"]
    assert got == sorted(expected)


def test_revenue_concentration_matches_python(spark):
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    rfx: dict[int, int] = {}
    for ck, tp in zip(
        orders["o_custkey"].astype("int64"), orders["o_totalprice"]
    ):
        rfx[ck] = rfx.get(ck, 0) + _fx(tp)
    sorted_rfx = sorted(rfx.values())
    cuts = [_rank_at(sorted_rfx, i / 10.0) for i in range(1, 10)]
    agg: dict[int, list[int]] = {}
    for r in rfx.values():
        decile = 1 + sum(1 for c in cuts if r > c)
        a = agg.setdefault(decile, [0, 0])
        a[0] += 1
        a[1] += r
    total = float(sum(v[1] for v in agg.values()))
    expected = []
    cum = 0
    for dec in sorted(agg, reverse=True):
        n_c, dfx = agg[dec]
        cum += dfx
        expected.append(
            (
                float(cum) / total,
                dec,
                n_c,
                float(dfx) / 1_000_000.0,
                float(dfx) / total,
            )
        )
    got, cols = _spark_rows(spark, "q_revenue_concentration")
    assert cols == [
        "cum_share", "decile", "n_customers", "revenue", "share",
    ]
    assert got == sorted(expected)


def test_winsorized_mean_matches_python(spark):
    ev = _events()
    expected = []
    for et, grp in ev.groupby("event_type"):
        vals = sorted(grp["value"])
        p05 = _rank_at(vals, 0.05)
        p95 = _rank_at(vals, 0.95)
        s = sum(_fx(min(max(v, p05), p95)) for v in grp["value"])
        expected.append(
            (et, len(grp), p05, p95, float(s) / 1_000_000.0)
        )
    got, cols = _spark_rows(spark, "q_winsorized_mean")
    assert cols == ["event_type", "n_events", "p05", "p95", "wmean_sum"]
    assert got == sorted(expected)
