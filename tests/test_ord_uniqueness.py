"""Pin the total-order assumption the tick-staple family leans on.

Every round-11 staple (EWMA fold order, arg_min/arg_max open/close, M4
extreme positions, CUSUM cp_ord, drawdown walk) is deterministic only
because ``ord = ts_us * 1000 + event_id % 1000`` is a TOTAL order per
user_id over the events table. That holds in the testdata because
(user_id, ts_us) is unique — but a same-microsecond pair whose event_ids
are congruent mod 1000 would silently break determinism, and the
independent Python references in tests/test_timeseries_staples.py reuse
the identical key, so no other tier would catch the collision (round-11
ADVICE item 1). This test makes the assumption a measured fact at every
committed data tier, with DuckDB (no Spark session — it runs in ms).
"""

from __future__ import annotations

import os
from pathlib import Path

import duckdb
import pytest

TIERS = [
    p
    for p in (
        Path("/root/testdata/sf0.001"),
        Path("/root/testdata/sf0.01"),
        Path("/root/testdata/sf0.1"),
        Path(__file__).resolve().parent.parent / "testdata_sf1",
        Path(os.environ.get("TEST_SF_DIR", "")),
    )
    if p and (p / "events.parquet").exists()
]


@pytest.mark.parametrize("tier", TIERS, ids=[p.name for p in TIERS])
def test_ord_is_a_total_order_per_user(tier: Path):
    con = duckdb.connect()
    dup, total = con.execute(
        f"""
        SELECT count(*) - count(DISTINCT (user_id,
                 epoch_us(ts) * 1000 + event_id % 1000)),
               count(*)
        FROM read_parquet('{tier / "events.parquet"}')
        """
    ).fetchone()
    assert total > 0
    assert dup == 0, (
        f"{dup} colliding (user_id, ord) keys in {tier}: the staple "
        "family's ordering is no longer total — switch the ord key to "
        "a dense row_number before trusting any of its results"
    )
