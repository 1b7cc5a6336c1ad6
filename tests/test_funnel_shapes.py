"""q_event_funnel's two physical shapes must agree — including on the
degenerate heavy-hitter (bot) shape the bounded-state twin exists for.

The default shape collects each user's click/purchase timestamps into
per-user arrays inside one hash aggregate (fast, but state grows with
the user's history); event_funnel_bounded_state keeps O(1) state per
user via the (min_view, max_click, max_purchase) identity + one
co-partitioned click re-test. Equality here pins the identity's strict
boundary semantics (clicks AT min_view or AT max_purchase never count)
and the hypothesis sweep covers random interleavings.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from hypothesis import given, settings, strategies as st

from open_rust_timeseries_db_spark.queries import all_queries
from open_rust_timeseries_db_spark.queries.analytic import (
    event_funnel_bounded_state,
)

_TYPES = ["view", "click", "purchase", "scroll"]


def _write_events(spark, rows) -> str:
    d = tempfile.mkdtemp(prefix="sg_funnel_")
    df = spark.createDataFrame(
        [(u, t * 1000, e, u, 0.0, "{}") for u, t, e in rows]
        or [(None, None, None, None, None, None)],
        "user_id long, ts long, event_type string, "
        "event_id long, value double, props string",
    )
    if not rows:
        df = df.filter("user_id IS NOT NULL")
    # events.parquet carries a ts column read as epoch-nanos long by
    # events_us (ts div 1000 -> micros); value column unused here.
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def _funnel_pair(spark, sf_dir):
    cur = tuple(all_queries()["q_event_funnel"].fn(spark, sf_dir).collect()[0])
    bnd = tuple(event_funnel_bounded_state(spark, sf_dir).collect()[0])
    return cur, bnd


def _naive(rows):
    users = {u for u, _, _ in rows}
    n_view = n_click = n_full = 0
    for u in users:
        ts = sorted((t, e) for uu, t, e in rows if uu == u)
        t1 = min((t for t, e in ts if e == "view"), default=None)
        if t1 is None:
            continue
        n_view += 1
        t2 = min((t for t, e in ts if e == "click" and t > t1), default=None)
        if t2 is None:
            continue
        n_click += 1
        t3 = min(
            (t for t, e in ts if e == "purchase" and t > t2), default=None
        )
        if t3 is not None:
            n_full += 1
    return (len(users), n_view, n_click, n_full)


def test_gate_selects_bounded_shape_for_hot_user(spark):
    """The served query's CMS gate: with a state bound below the bot
    user's event count, q_event_funnel must (a) route to the
    bounded-state twin — no collect_list anywhere in the executed plan
    — and (b) return the identical result. With the default bound it
    keeps the array shape. Also pins the gate's one-sidedness: the
    sketch bound never undercounts the true hottest user."""
    from open_rust_timeseries_db_spark.queries.analytic import (
        max_user_events_bound,
    )

    rows = [(1, 10_000 + i, "click") for i in range(500)]
    rows += [(1, 9_000, "view"), (1, 20_000, "purchase")]
    rows += [(2, 1, "view"), (2, 2, "click"), (2, 3, "purchase")]
    sf_dir = _write_events(spark, rows)
    fn = all_queries()["q_event_funnel"].fn

    bound = max_user_events_bound(spark, sf_dir)
    assert bound >= 502, f"CMS bound {bound} undercounts the 502-event bot"

    gated = fn(spark, sf_dir, state_bound=100)
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan, "gate did not route to bounded shape"
    default = fn(spark, sf_dir)
    dplan = default._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" in dplan, "default should keep the array shape"
    assert tuple(gated.collect()[0]) == tuple(default.collect()[0]) == (
        2, 2, 2, 2,
    )


def test_bot_user_shape_agrees(spark):
    """One bot user with a long, funnel-completing history plus edge
    users exercising the strict boundaries (click AT the first view's
    timestamp / purchase AT the first qualifying click's timestamp must
    NOT advance the funnel)."""
    rows = []
    # Bot: 5k clicks straddling its first view, purchases before the
    # last click (so the interval test, not max-click, must decide).
    rows += [(1, 10_000 + i, "click") for i in range(2_000)]
    rows += [(1, 13_000, "view")]
    rows += [(1, 13_001 + i, "click") for i in range(3_000)]
    rows += [(1, 14_000, "purchase")]
    # Boundary user: click exactly at t1 (no stage 2).
    rows += [(2, 100, "view"), (2, 100, "click"), (2, 200, "purchase")]
    # Boundary user: purchase exactly at t2 (no stage 3).
    rows += [(3, 10, "view"), (3, 20, "click"), (3, 20, "purchase")]
    # Full-funnel user.
    rows += [(4, 1, "view"), (4, 2, "click"), (4, 3, "purchase")]
    # View-only user.
    rows += [(5, 7, "view")]
    sf_dir = _write_events(spark, rows)
    cur, bnd = _funnel_pair(spark, sf_dir)
    assert cur == bnd
    assert cur == (5, 5, 3, 2) == _naive(rows)


@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=30),
            st.sampled_from(_TYPES),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_funnel_shapes_agree_random(spark, rows):
    sf_dir = _write_events(spark, rows)
    cur, bnd = _funnel_pair(spark, sf_dir)
    assert cur == bnd == _naive(rows)
