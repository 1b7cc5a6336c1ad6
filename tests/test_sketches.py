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


def test_ann_recall_slo_wide_query_set(spark):
    """Recall SLO over a WIDE deterministic query set (the oracle-gated
    q_ann_recall samples 10 vectors; this is the quality gate at 10x
    that): 100 query vectors at sf0.01, macro recall@5 of the IVF probe
    vs the exact baseline. Three contracts:

    - the default nprobe (4) delivers the measured floor (0.89 on
      this corpus; asserted >= 0.8 — uniform 4-of-5 cells would give
      0.8 exactly, and the probe ranking must beat uniform),
    - recall is MONOTONE in nprobe (the probe list is a superset), and
    - probing every cell reproduces the exact top-k verbatim
      (recall == 1.0) — the approximate path degrades to exact, which
      pins the scoring arithmetic of both paths to each other.
    """
    import collections

    from open_rust_timeseries_db_spark.functions.vectors import (
        ivf_probe_search_cached,
        local_topk_cosine,
    )
    from open_rust_timeseries_db_spark.queries.similarity import (
        _ann_matrices,
        _assigned_ckpt,
    )
    from open_rust_timeseries_db_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.01"  # 500 vectors, 5 IVF cells
    emb = load_table(spark, sf, "embeddings")
    cent_rows, _ = _ann_matrices(emb)
    q_rows = [
        (r[0], r[1])
        for r in emb.filter("vec_id < 100")
        .select("vec_id", "embedding")
        .collect()
    ]
    assert len(q_rows) == 100
    assigned = _assigned_ckpt(emb)

    def topk_sets(rows):
        by_q = collections.defaultdict(list)
        for r in rows:
            by_q[r["query_id"]].append((r["cosine"], r["neighbor_id"]))
        return {
            q: {
                n
                for _, n in sorted(v, key=lambda t: (-t[0], t[1]))[:5]
            }
            for q, v in by_q.items()
        }

    exact_sets = topk_sets(
        local_topk_cosine(
            assigned.select("vec_id", "embedding"), q_rows, k=5
        ).collect()
    )
    from open_rust_timeseries_db_spark.queries.similarity import _NPROBE

    macros = []
    for nprobe in (1, _NPROBE, len(cent_rows)):
        ap_sets = topk_sets(
            ivf_probe_search_cached(
                assigned, cent_rows, q_rows, nprobe=nprobe, k=5
            ).collect()
        )
        recalls = [
            len(exact_sets[q] & ap_sets.get(q, set())) / len(exact_sets[q])
            for q in exact_sets
        ]
        macros.append(sum(recalls) / len(recalls))
    assert macros[1] >= 0.8, (
        f"recall@5 SLO broke: nprobe={_NPROBE} macro {macros[1]:.3f}"
    )
    assert macros[0] <= macros[1] <= macros[2], f"recall not monotone: {macros}"
    assert macros[2] == 1.0, f"full probe must be exact, got {macros[2]:.4f}"


def test_count_min_one_sided_and_bounded_grid(spark):
    """CMS invariants on an adversarially skewed synthetic corpus: the
    estimate NEVER undercounts any key (the property skew decisions
    rely on), the grid stays <= depth*width rows however many keys go
    in, and every estimate respects the e*N/width Markov bound for
    this deterministic hash family."""
    from open_rust_timeseries_db_spark.operators.sketches import (
        cms_estimate,
        count_min_cells,
    )

    # 1 bot key with 5000 rows + 10k long-tail keys with 1 row each.
    df = spark.range(0, 15_000).select(
        F.when(F.col("id") < 5_000, F.lit(-1))
        .otherwise(F.col("id"))
        .alias("k")
    )
    depth, width = 4, 256  # narrow grid to force real collisions
    cms = count_min_cells(df, "k", depth, width).collect()
    assert len(cms) <= depth * width
    n = sum(r["c"] for r in cms if r["j"] == 0)
    assert n == 15_000
    keys = df.distinct()
    est = {
        r["k"]: r["est_n"]
        for r in cms_estimate(
            keys,
            count_min_cells(df, "k", depth, width),
            "k",
            depth,
            width,
        ).collect()
    }
    exact = {r["k"]: r["cnt"] for r in df.groupBy("k").count().withColumnRenamed("count", "cnt").collect()}
    import math

    slack = math.ceil(2.718281828 * n / width)
    assert all(est[k] >= exact[k] for k in exact), "undercount: broken CMS"
    over = [est[k] - exact[k] for k in exact]
    assert max(over) <= slack, f"max overcount {max(over)} > Markov slack {slack}"
    # The bot key must dominate every estimate (heavy hitter visible).
    assert est[-1] >= 5_000


def test_count_min_unseen_candidate_estimates_zero_or_bound(spark):
    """A candidate key ABSENT from the sketched input must still get a
    row (left-join + coalesce, not the old inner join that silently
    dropped it), and its estimate must stay one-sided: >= 0 == its true
    count. With a grid wide enough that some cell stays empty, the
    estimate is exactly 0."""
    from open_rust_timeseries_db_spark.operators.sketches import (
        cms_estimate,
        count_min_cells,
    )

    df = spark.range(0, 50).select(F.col("id").alias("k"))
    depth, width = 4, 4096  # plenty of empty cells for 50 keys
    cms = count_min_cells(df, "k", depth, width)
    unseen = spark.range(1_000_000, 1_000_005).select(F.col("id").alias("k"))
    est = {
        r["k"]: r["est_n"]
        for r in cms_estimate(unseen, cms, "k", depth, width).collect()
    }
    assert set(est) == {1_000_000 + i for i in range(5)}, "unseen keys dropped"
    assert all(v == 0 for v in est.values()), est


def test_count_min_merges_by_cell_addition(spark):
    """Mergeability — the property that makes the sketch shippable
    across partitions, streams and days: grid(A ++ B) must equal
    cell-wise grid(A) + grid(B)."""
    from open_rust_timeseries_db_spark.operators.sketches import (
        count_min_cells,
    )

    a = spark.range(0, 700).select((F.col("id") % 37).alias("k"))
    b = spark.range(0, 900).select((F.col("id") % 53).alias("k"))
    depth, width = 3, 64
    ga = {
        (r["j"], r["cell"]): r["c"]
        for r in count_min_cells(a, "k", depth, width).collect()
    }
    gb = {
        (r["j"], r["cell"]): r["c"]
        for r in count_min_cells(b, "k", depth, width).collect()
    }
    gu = {
        (r["j"], r["cell"]): r["c"]
        for r in count_min_cells(a.unionAll(b), "k", depth, width).collect()
    }
    merged = {cell: ga.get(cell, 0) + gb.get(cell, 0) for cell in set(ga) | set(gb)}
    assert gu == merged


def test_cms_width_scales_with_threshold_geometry():
    """Width must grow with n/threshold so a fixed gate threshold
    stays discriminating (collision floor ~n/width >= 8x below the
    threshold), clamped to [CMS_WIDTH, CMS_MAX_WIDTH]."""
    from open_rust_timeseries_db_spark.operators.sketches import (
        CMS_MAX_WIDTH,
        CMS_WIDTH,
        cms_width_for,
    )

    # small inputs and unknown counts keep the default width
    assert cms_width_for(None, 1_000_000) == CMS_WIDTH
    assert cms_width_for(6_000_000, 1_000_000) == CMS_WIDTH
    # the ADVICE failure tier: ~4B events over a 1M threshold needs
    # width such that floor = n/width <= threshold/8 -> >= 32768
    w = cms_width_for(4_000_000_000, 1_000_000)
    assert w >= 8 * 4_000_000_000 // 1_000_000
    assert 4_000_000_000 / w <= 1_000_000 / 8
    # monotone in n, capped at the broadcastable ceiling
    assert cms_width_for(10**15, 1_000_000) == CMS_MAX_WIDTH
