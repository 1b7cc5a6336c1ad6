"""Accuracy contracts for the approximate (sketch) operators.

These can't be oracle-checked — HLL/KLL estimates are engine-specific
by design — so their 100 TB usefulness rests on the error bounds
asserted here against the exact twins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.01"


def test_approx_distinct_error_bound(spark):
    qs = all_queries()
    approx = {
        r["event_type"]: r["approx_users"]
        for r in qs["q_approx_distinct"].fn(spark, SF_DIR).collect()
    }
    from open_rust_timeseries_db_spark.sources.catalog import load_table

    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        rel = abs(est - exact[k]) / max(1, exact[k])
        assert rel <= 0.05, f"{k}: approx {est} vs exact {exact[k]} ({rel:.2%})"


def test_approx_percentile_brackets_exact(spark):
    qs = all_queries()
    approx = qs["q_approx_percentile"].fn(spark, SF_DIR).collect()[0]
    exact = qs["q_latency_percentiles"].fn(spark, SF_DIR).collect()[0]
    # Exact twin reports the same quantiles; sketches must land within
    # 1% relative of the exact value at this accuracy setting.
    for a_col, e_col in [
        ("p50", "p50"), ("p90", "p90"), ("p99", "p99"), ("p999", "p999"),
    ]:
        a, e = float(approx[a_col]), float(exact[e_col])
        assert abs(a - e) / e <= 0.01, f"{a_col}: {a} vs exact {e}"


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
