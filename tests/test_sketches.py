"""Accuracy contracts for the approximate (sketch) operators.

Raw HLL/KLL estimates are engine-specific by design, so since round 6
the registered sketch queries emit the error-bound CHECK itself (exact
value + within-bound flag, both deterministic) and ARE oracle-checked;
the tests here additionally pin the raw-estimate contracts (the
underlying sketch really is within its published bound, and the sketch
values track the exact twins) so a bound-flag bug can't hide a broken
sketch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.01"


def test_approx_distinct_error_bound(spark):
    qs = all_queries()
    got = {
        r["event_type"]: r
        for r in qs["q_approx_distinct"].fn(spark, SF_DIR).collect()
    }
    from open_rust_timeseries_db_spark.sources.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, row in got.items():
        assert row["exact_users"] == exact[k]
        assert row["within_bound"], f"{k}: HLL out of 5% bound"
    # The flag must reflect the RAW estimate: recompute it directly.
    raw = {
        r["event_type"]: r["a"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("a"))
        .collect()
    }
    for k, est in raw.items():
        rel = abs(est - exact[k]) / max(1, exact[k])
        assert rel <= 0.05, f"{k}: approx {est} vs exact {exact[k]} ({rel:.2%})"


def test_approx_percentile_brackets_exact(spark):
    qs = all_queries()
    rows = {
        r["p"]: r for r in qs["q_approx_percentile"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {0.5, 0.9, 0.99, 0.999, 0.9999}
    exact = qs["q_latency_percentiles"].fn(spark, SF_DIR).collect()[0]
    for p, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99"), (0.999, "p999"), (0.9999, "p9999")]:
        r = rows[p]
        assert r["rank_ok"], f"p={p}: sketch outside rank bound"
        # The emitted exact value is the nearest-rank twin's value (the
        # twin runs unfiltered; all lags are positive on this data).
        assert r["exact_lag_us"] == exact[col], f"p={p}"


def test_ann_search_recall_against_exact(spark):
    """IVF nprobe search must recover most of the exact top-k: the
    accuracy contract of the approximate path (same spirit as the
    sketch error bounds). Recall@5 over the query set, macro-averaged."""
    from tests.conftest import SF_DIR
    from open_rust_timeseries_db_spark.queries import all_queries

    qs = all_queries()
    exact = qs["q_cosine_topk"].fn(spark, SF_DIR).collect()
    approx = qs["q_ann_search"].fn(spark, SF_DIR).collect()
    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets: dict = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # Same query universe (vec_id < 10 on both sides).
    assert set(approx_sets) == set(exact_sets)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    macro = sum(recalls) / len(recalls)
    # nprobe=2 of ~50 cells at sf0.001; random cells would give ~4%
    # recall — the probe ranking has to be doing the work.
    assert macro >= 0.5, f"macro recall@5 {macro:.2f}, per-query {recalls}"
