"""The driver checks only the first 50 registry entries per round, so
the registry must order queries least-recently-checked first (derived
from committed CORRECTNESS_r*.json) — the self-rotating coverage window.
No Spark needed: ordering is a pure function of the registry + committed
correctness files.
"""

from __future__ import annotations

from open_rust_timeseries_db_spark.queries import all_queries
from open_rust_timeseries_db_spark.queries.registry import (
    REWRITE_ROUND,
    _last_checked_round,
)


def _effective_round(last: dict[str, int], n: str) -> int:
    if n not in last:
        return -2
    if last[n] < REWRITE_ROUND.get(n, 0):
        return -1  # rewritten since its last driver check
    return last[n]


def test_rotation_orders_least_recently_checked_first():
    last = _last_checked_round()
    names = list(all_queries())
    rounds = [_effective_round(last, n) for n in names]
    assert rounds == sorted(rounds), (
        "registry order must be non-decreasing in effective last-checked "
        f"round; got {list(zip(names, rounds))[:10]}..."
    )


def test_unchecked_rewrites_sit_inside_the_window():
    # A query rewritten after its last driver hash check must land in
    # the next round's 50-entry correctness window (until the check
    # happens, at which point the flag self-expires).
    last = _last_checked_round()
    names = list(all_queries())
    pending = [
        n for n, rnd in REWRITE_ROUND.items() if last.get(n, -1) < rnd
    ]
    for n in pending:
        assert names.index(n) < 50, f"{n} rewritten but outside the window"


def test_never_checked_queries_lead_the_window():
    last = _last_checked_round()
    names = list(all_queries())
    never = [n for n in names if n not in last]
    if never:
        # every never-checked query must sit inside the 50-entry window
        # (assuming fewer than 50 land in one round)
        assert all(names.index(n) < 50 for n in never[:50])
