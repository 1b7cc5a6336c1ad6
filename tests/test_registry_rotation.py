"""The driver checks only the first 50 registry entries per round, so
the registry must order queries least-recently-checked first (derived
from committed CORRECTNESS_r*.json) — the self-rotating coverage window.
No Spark needed: ordering is a pure function of the registry + committed
correctness files.
"""

from __future__ import annotations

from open_rust_timeseries_db_spark.queries import all_queries
from open_rust_timeseries_db_spark.queries.registry import _last_checked_round


def test_rotation_orders_least_recently_checked_first():
    last = _last_checked_round()
    names = list(all_queries())
    rounds = [last.get(n, -1) for n in names]
    assert rounds == sorted(rounds), (
        "registry order must be non-decreasing in last-checked round; "
        f"got {list(zip(names, rounds))[:10]}..."
    )


def test_never_checked_queries_lead_the_window():
    last = _last_checked_round()
    names = list(all_queries())
    never = [n for n in names if n not in last]
    if never:
        # every never-checked query must sit inside the 50-entry window
        # (assuming fewer than 50 land in one round)
        assert all(names.index(n) < 50 for n in never[:50])
