"""Brute-force Python references for the round-12 statistics staples.

Same triangulation contract as tests/test_timeseries_staples.py and
tests/test_indicator_staples.py: the oracle-parity suite proves
Spark == DuckDB; these prove both equal an INDEPENDENT straight-line
Python implementation, so a bug shared by the two SQL formulations
cannot self-certify. Floats are compared EXACTLY — every reference
replays the query's documented IEEE sequence (fixed-point integer
sums, then the same cast/divide/multiply order).
"""

from __future__ import annotations

import math

import pandas as pd

from open_rust_timeseries_db_spark.queries import all_queries
from tests.conftest import SF_DIR

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000
_X0_US = 1_704_067_200_000_000

QS = all_queries()


def _fx(v: float) -> int:
    return int(math.floor(v * 1_000_000 + 0.5))


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


def _moments(pairs):
    """(n, sx, sy, sxx, sxy, syy) via the dsum fixed-point sequence."""
    n = len(pairs)
    sx = float(sum(_fx(x) for x, _ in pairs)) / 1_000_000.0
    sy = float(sum(_fx(y) for _, y in pairs)) / 1_000_000.0
    sxx = float(sum(_fx(x * x) for x, _ in pairs)) / 1_000_000.0
    sxy = float(sum(_fx(x * y) for x, y in pairs)) / 1_000_000.0
    syy = float(sum(_fx(y * y) for _, y in pairs)) / 1_000_000.0
    return n, sx, sy, sxx, sxy, syy


def test_ols_trend_matches_python_fit(spark):
    ev = _events()
    expected = []
    for uid, grp in ev.groupby("user_id"):
        pairs = [
            (float(t - _X0_US) / 3600000000.0, v)
            for t, v in zip(grp["ts_us"], grp["value"])
        ]
        n, sx, sy, sxx, sxy, syy = _moments(pairs)
        if n < 2:
            continue
        covar = sxy / n - (sx / n) * (sy / n)
        var_x = sxx / n - (sx / n) * (sx / n)
        var_y = syy / n - (sy / n) * (sy / n)
        if not (var_x > 0 and var_y > 0):
            continue
        slope = covar / var_x
        expected.append(
            (
                sy / n - slope * (sx / n),
                n,
                covar * covar / (var_x * var_y),
                slope,
                uid,
            )
        )
    got, cols = _spark_rows(spark, "q_ols_trend")
    assert cols == ["intercept", "n", "r2", "slope_per_hour", "user_id"]
    assert got == sorted(expected)


def test_acf_matches_python_walk(spark):
    ev = _events()
    ev["bucket_hour"] = ev["ts_us"] // _HOUR_US
    expected = []
    for uid, grp in ev.groupby("user_id"):
        bars: dict[int, list[int]] = {}
        for _, r in grp.iterrows():
            a = bars.setdefault(int(r["bucket_hour"]), [0, 0])
            a[0] += _fx(r["value"])
            a[1] += 1
        hours = sorted(bars)
        series = [float(bars[h][0]) / 1_000_000.0 / bars[h][1] for h in hours]
        for lag in range(1, 6):
            pairs = [
                (series[i], series[i - lag])
                for i in range(lag, len(series))
            ]
            n = len(pairs)
            if n < 2:
                continue
            n, sx, sy, sxx, sxy, syy = _moments(pairs)
            covar = sxy / n - (sx / n) * (sy / n)
            var_x = sxx / n - (sx / n) * (sx / n)
            var_y = syy / n - (sy / n) * (sy / n)
            if not (var_x > 0 and var_y > 0):
                continue
            expected.append(
                (covar / math.sqrt(var_x * var_y), lag, n, uid)
            )
    got, cols = _spark_rows(spark, "q_acf")
    assert cols == ["acf", "lag_k", "n_pairs", "user_id"]
    assert got == sorted(expected)


def test_markov_transitions_matches_python_counts(spark):
    ev = _events()
    counts: dict[tuple, int] = {}
    for _, grp in ev.groupby("user_id"):
        seq = list(grp.sort_values("ord")["event_type"])
        for prev, nxt in zip(seq, seq[1:]):
            counts[(prev, nxt)] = counts.get((prev, nxt), 0) + 1
    totals: dict[str, int] = {}
    for (prev, _), n in counts.items():
        totals[prev] = totals.get(prev, 0) + n
    expected = sorted(
        (n, nxt, prev, float(n) / float(totals[prev]))
        for (prev, nxt), n in counts.items()
    )
    got, cols = _spark_rows(spark, "q_markov_transitions")
    assert cols == ["n", "next_type", "prev_type", "prob"]
    assert got == expected


def test_hourofweek_profile_matches_python(spark):
    ev = _events()
    cells: dict[tuple, list[int]] = {}
    for _, r in ev.iterrows():
        dow = int((r["ts_us"] // _DAY_US + 4) % 7)
        hod = int((r["ts_us"] % _DAY_US) // _HOUR_US)
        a = cells.setdefault((dow, hod), [0, 0])
        a[0] += 1
        a[1] += _fx(r["value"])
    total = sum(a[0] for a in cells.values())
    n_cells = len(cells)
    expected = sorted(
        (
            (float(n) / total) * n_cells,
            dow,
            hod,
            float(sfx) / 1_000_000.0 / n,
            n,
        )
        for (dow, hod), (n, sfx) in cells.items()
    )
    got, cols = _spark_rows(spark, "q_hourofweek_profile")
    assert cols == [
        "activity_index", "dow", "hour_of_day", "mean_value", "n_events",
    ]
    assert got == expected


def test_welch_ttest_matches_python(spark):
    ev = _events()
    expected = []
    for uid, grp in ev.groupby("user_id"):
        a = grp[grp["event_type"] == "purchase"]["value"]
        b = grp[grp["event_type"] == "click"]["value"]
        na, nb = len(a), len(b)
        if na < 2 or nb < 2:
            continue
        ma = float(sum(_fx(v) for v in a)) / 1_000_000.0 / na
        mb = float(sum(_fx(v) for v in b)) / 1_000_000.0 / nb
        va = (
            float(sum(_fx(v * v) for v in a)) / 1_000_000.0 / na - ma * ma
        ) * na / (na - 1)
        vb = (
            float(sum(_fx(v * v) for v in b)) / 1_000_000.0 / nb - mb * mb
        ) * nb / (nb - 1)
        sea, seb = va / na, vb / nb
        if not sea + seb > 0:
            continue
        t = (ma - mb) / math.sqrt(sea + seb)
        dof = (sea + seb) * (sea + seb) / (
            sea * sea / (na - 1) + seb * seb / (nb - 1)
        )
        # sorted-column order: dof, mean_click, mean_purchase, ...
        expected.append((dof, mb, ma, na, nb, t, uid))
    got, cols = _spark_rows(spark, "q_welch_ttest")
    assert cols == [
        "dof", "mean_click", "mean_purchase", "na", "nb", "t_stat", "user_id",
    ]
    assert got == sorted(expected)


_BENFORD_P = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def test_benford_digits_matches_python(spark):
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    counts: dict[int, int] = {}
    for tp in orders["o_totalprice"]:
        if tp < 1:
            continue
        d = int(str(int(math.floor(tp)))[0])
        counts[d] = counts.get(d, 0) + 1
    total = sum(counts.values())
    expected = []
    for d, n in counts.items():
        p = _BENFORD_P[d]
        share = float(n) / float(total)
        chi2 = (
            (float(n) - float(total) * p)
            * (float(n) - float(total) * p)
            / (float(total) * p)
        )
        expected.append((p, chi2, d, share - p, n, share))
    got, cols = _spark_rows(spark, "q_benford_digits")
    assert cols == [
        "benford_p", "chi2_term", "digit", "excess", "n_orders", "share",
    ]
    assert got == sorted(expected)


def test_session_confs_scope_to_the_declaring_query(spark):
    """q_group_percentiles declares AQE off; the NEXT query build must
    restore the session baseline (the restore-on-next-build scope)."""
    # Normalize first: an earlier test may have left another query's
    # override active; building an override-free query restores it.
    QS["q_latency_percentiles"].fn(spark, SF_DIR)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    QS["q_group_percentiles"].fn(spark, SF_DIR)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    QS["q_latency_percentiles"].fn(spark, SF_DIR)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    # A plan-memo cache HIT must re-apply the override all the same.
    QS["q_group_percentiles"].fn(spark, SF_DIR)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    QS["q_latency_percentiles"].fn(spark, SF_DIR)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
