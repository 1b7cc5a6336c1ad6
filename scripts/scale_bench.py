"""Benchmark the forced 100-TB scale paths against the default paths.

The dedup/clustering family has byte-estimated physical-strategy
cutovers: small inputs broadcast (self-equi-join on the bucket key),
large inputs take the grouped inline-expansion path (ONE shuffle,
pairs expanded per bucket) — and connected components switches from a
driver union-find (edge list bounded) to distributed min-label
propagation. At testdata scale the broadcast/driver paths always win
the cutover, so the round-3 verdict flagged that the scale shapes were
equality-TESTED but never TIMED.

This script times both: each family query runs warm (2 passes, shared
kernel caches pre-built so only the pair-generation strategy differs),
first with default cutovers, then with the scale paths FORCED
(BROADCAST_MAX_BYTES=0, DRIVER_CC_MAX_EDGES=0). Writes
SCALE_BENCH.json at the repo root.

Interpretation: forced/default ratio is the LOCAL price of the scale
shape at toy size — grouped expansion pays a real shuffle where the
broadcast path ships 12 MB; at 100 TB the broadcast path simply does
not exist (the bucketed table cannot ship to every executor), so the
question this answers is "is the scale shape sane, not pathological"
(ratio within ~2x at a size where its fixed costs are LEAST amortized).

Usage:
    python scripts/scale_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Queries whose physical strategy the knobs flip (dedup pair
# generation, clustering) — plus close family members as controls
# (expected ratio ~1.0: same path both phases).
SWEEP = [
    "q_dedup_near",
    "q_minhash_jaccard",
    "q_ngram_jaccard",
    "q_simhash",
    "q_dedup_clusters",
    "q_contamination",
    "q_winnow_neardup",
    "q_dedup_exact",
]


def skewed_documents(spark, sf_dir: str, hot_every: int = 100):
    """The sf_dir documents corpus with a deliberately HOT LSH bucket:
    every ``hot_every``-th doc's text is replaced by one shared 40-token
    phrase plus a per-doc unique tail token.

    The hot docs all share ~38 of ~41 shingles (pairwise Jaccard ~0.86),
    so every shared shingle's bucket — and, via near-identical MinHash
    signatures, the band buckets — holds the whole 1% cohort: the
    bucket-size distribution becomes 25-50x skewed vs the organic
    corpus. This is the regime the grouped inline-expansion path's
    per-bucket O(c^2) work is feared for; the skew sweep times it and
    gates result parity between the physical paths on it.
    """
    from open_rust_timeseries_db_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    hot = " ".join(f"hotphrase{i}" for i in range(40))
    return docs.selectExpr(
        "doc_id",
        f"CASE WHEN doc_id % {hot_every} = 1 THEN "
        f"'{hot} uniq' || CAST(doc_id AS STRING) ELSE text END AS text",
        "lang",
        "source",
        "n_chars",
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import open_rust_timeseries_db_spark.operators.dedupe as dd
    import open_rust_timeseries_db_spark.operators.graph as gr

    _SALT_DEFAULTS = (
        dd.SALT_MIN_SOURCE_ROWS,
        dd.SALT_BUCKET_MIN_ROWS,
        dd.SALT_TARGET_ROWS,
    )
    from open_rust_timeseries_db_spark.queries import all_queries
    from open_rust_timeseries_db_spark.queries.cache_builds import (
        cache_builders,
    )
    from open_rust_timeseries_db_spark.session import get_spark

    spark = get_spark("scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # This harness flips physical-strategy gates mid-session; the
    # prepared-plan memo would serve pre-flip plans (registry docs).
    import open_rust_timeseries_db_spark.queries.registry as _reg
    _reg.PLAN_MEMO_ENABLED = False
    specs = all_queries()

    # Shared kernel tables identical across phases: build once so the
    # measured difference is the pair-generation strategy, not cache
    # materialization.
    for build in cache_builders(spark, sf_dir).values():
        build()

    def run_warm(name: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    default_t = {name: run_warm(name) for name in SWEEP}

    # HOT-BUCKET SKEW TIER (round-8): the same strategy flip, but on a
    # corpus where one cohort (~1% of docs) shares one phrase — every
    # shared shingle/band bucket holds the whole cohort, so the grouped
    # path's per-bucket O(c^2) expansion meets a genuinely hot bucket
    # instead of the organic corpus's 1-3-member buckets. Timed warm
    # both ways; parity of the two physical paths is ASSERTED here (and
    # unit-tested at sf0.001 in tests/test_dedupe_ops.py).
    sk = skewed_documents(spark, sf_dir).persist()
    sk.count()

    def skew_ops():
        return {
            "skew_minhash_neardup": lambda: dd.minhash_neardup(sk),
            "skew_exact_jaccard": lambda: dd.exact_jaccard(sk, None),
            "skew_simhash_pairs": lambda: dd.simhash_pairs(
                dd.simhash_signatures(sk)
            ),
        }

    def run_warm_op(fn) -> tuple[float, int]:
        n = 0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn().count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4), n

    skew_default = {k: run_warm_op(f) for k, f in skew_ops().items()}

    dd.BROADCAST_MAX_BYTES = 0
    gr.DRIVER_CC_MAX_EDGES = 0
    forced_t = {name: run_warm(name) for name in SWEEP}
    skew_forced = {k: run_warm_op(f) for k, f in skew_ops().items()}
    for k in skew_default:
        assert skew_default[k][1] == skew_forced[k][1], (
            f"{k}: hot-bucket row-count parity broke between physical "
            f"paths ({skew_default[k][1]} vs {skew_forced[k][1]})"
        )

    # Third phase: grouped path with SALTING forced on (thresholds
    # lowered so the ~50-member hot buckets actually split — the
    # production defaults only trigger past 4096 members). Measures
    # the salted shape's overhead/benefit at this tier and asserts the
    # exactly-once pair parity end-to-end.
    dd.SALT_MIN_SOURCE_ROWS = 0
    dd.SALT_BUCKET_MIN_ROWS = 16
    dd.SALT_TARGET_ROWS = 16
    skew_salted = {k: run_warm_op(f) for k, f in skew_ops().items()}
    for k in skew_default:
        assert skew_default[k][1] == skew_salted[k][1], (
            f"{k}: hot-bucket row-count parity broke under salting "
            f"({skew_default[k][1]} vs {skew_salted[k][1]})"
        )
    # Restore production thresholds before the hot10k phase below —
    # that phase must run the UNMODIFIED production gate.
    dd.SALT_MIN_SOURCE_ROWS = _SALT_DEFAULTS[0]
    dd.SALT_BUCKET_MIN_ROWS = _SALT_DEFAULTS[1]
    dd.SALT_TARGET_ROWS = _SALT_DEFAULTS[2]

    # BIG-HOT-BUCKET TIER (round-10): the tier where salting WINS. The
    # sf0.1 corpus's hot buckets top out at ~50 members, so the phase
    # above can only measure the salted machinery's fixed cost; here a
    # synthetic members table at production-gate scale (1.03M rows,
    # one 10k-member hot bucket + 34k organic 30-member buckets) makes
    # the unsalted grouped path expand c*(c-1)/2 ~= 50M pairs in ONE
    # task while the production-gated salted path splits the bucket
    # S=5 ways. No thresholds touched: the gate trips on the real row
    # count. Pair parity asserted exactly.
    hot_m = (
        spark.range(10_000)
        .select(F.lit(0).alias("g"), F.col("id").alias("id"))
        .unionByName(
            spark.range(34_000 * 30).select(
                (F.col("id") % 34_000 + 1).alias("g"),
                (F.col("id") + 10_000).alias("id"),
            )
        )
        .persist()
    )
    n_hot_rows = hot_m.count()

    def run_pairs(n_member_rows, cms_grid=None) -> tuple[float, int]:
        # Timed action is a noop WRITE, not count(): count() fuses the
        # pair explosion into a codegen'd counter that never
        # materializes a row, under-measuring the hot bucket's
        # single-task serialization by ~12x (measured: unsalted 2.0 s
        # count vs 24.7 s noop for the same 64.8M pairs). Downstream
        # consumers (jaccard filters, joins) consume real rows, so the
        # write-path number is the one that scales.
        def mk():
            return dd.salted_group_pairs(
                hot_m, ("g",), [], n_member_rows=n_member_rows,
                cms_grid=cms_grid,
            )

        n = mk().count()  # parity check only, untimed
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4), n

    # n_member_rows=0 forces the single-branch grouped plan (below the
    # gate); the real count engages the production salting path.
    hot10k_unsalted = run_pairs(0)
    hot10k_salted = run_pairs(n_hot_rows)
    # CMS-sized salted path: sizing probes a session-cached bounded
    # grid map-side instead of paying the exact groupBy(key).count()
    # shuffle (the ingest-maintained-artifact deployment shape).
    hot_grid = dd.cms_size_grid(hot_m, ("g",), n_hot_rows).persist()
    hot_grid.count()
    hot10k_cms = run_pairs(n_hot_rows, cms_grid=hot_grid)
    assert hot10k_unsalted[1] == hot10k_cms[1], (
        "hot10k CMS-sized pair parity broke: "
        f"{hot10k_unsalted[1]} vs {hot10k_cms[1]}"
    )
    assert hot10k_unsalted[1] == hot10k_salted[1], (
        "hot10k pair parity broke: "
        f"{hot10k_unsalted[1]} vs {hot10k_salted[1]}"
    )

    out = {
        "sf_dir": sf_dir,
        "policy": (
            "warm = min of 2 passes, shared kernel caches pre-built in "
            "both phases; forced = BROADCAST_MAX_BYTES=0 + "
            "DRIVER_CC_MAX_EDGES=0 (grouped inline-expansion pair "
            "generation, distributed min-label-propagation CC). "
            "Rows at ~2x (q_ngram_jaccard, q_dedup_near): the gap is "
            "the broadcast probe's fused join+partial-agg stage, which "
            "the grouped path trades for ObjectHashAggregate collect + "
            "explode; the two shuffled self-join alternatives "
            "(shuffle_hash, merge hints) were measured WORSE at sf0.1, "
            "so the grouped shape stands as the scale path - at 100 TB "
            "the broadcast side cannot exist and the grouped path's "
            "one corpus shuffle beats the self-join's two. The sf1 "
            "tier CONFIRMS the crossover empirically: there the "
            "grouped path is 2-5x FASTER than broadcasting the 125 MB "
            "shingle side (see operators/dedupe.BROADCAST_MAX_BYTES)."
        ),
        "queries": {
            name: {
                "default_warm_sec": default_t[name],
                "forced_scale_warm_sec": forced_t[name],
                "ratio": round(forced_t[name] / default_t[name], 2)
                if default_t[name] > 0
                else None,
            }
            for name in SWEEP
        },
        "skew": {
            "policy": (
                "hot-bucket tier: 1% of docs share one 40-token phrase "
                "(one bucket holds the whole cohort; 25-50x bucket-size "
                "skew). Same warm min-of-2 in all three phases; row "
                "counts asserted equal between the physical paths. "
                "forced_salted = grouped path with salting thresholds "
                "forced three orders below production (SALT_MIN_SOURCE_"
                "ROWS=0, MIN_ROWS=16, TARGET=16) so the ~50-member hot "
                "buckets actually split — at this tier that only "
                "measures the machinery's fixed cost (extra skinny "
                "count shuffle + two-branch union), which is exactly "
                "why the production gate exists. Reading the ratios: "
                "the residual forced-vs-default gap is STAGE-bound, "
                "not skew-bound — skew_simhash_pairs moves ~100x the "
                "pair rows of skew_minhash_neardup through the same "
                "grouped shape at ~1.0x, so the minhash/exact gaps are "
                "the grouped plan's extra exchange waves at ~1 s "
                "absolute scale, which amortize at the sf1 tier (see "
                "top-level policy: grouped is 2-5x FASTER there)."
            ),
            "queries": {
                k: {
                    "default_warm_sec": skew_default[k][0],
                    "forced_scale_warm_sec": skew_forced[k][0],
                    "forced_salted_warm_sec": skew_salted[k][0],
                    "rows": skew_default[k][1],
                    "ratio": round(
                        skew_forced[k][0] / skew_default[k][0], 2
                    )
                    if skew_default[k][0] > 0
                    else None,
                    "ratio_salted": round(
                        skew_salted[k][0] / skew_default[k][0], 2
                    )
                    if skew_default[k][0] > 0
                    else None,
                }
                for k in skew_default
            },
        },
        "skew_hot10k": {
            "policy": (
                "big-hot-bucket tier, PRODUCTION thresholds (no knob "
                "forced): 1.03M member rows, one 10k-member hot bucket "
                "+ 34k organic 30-member buckets. The unsalted grouped "
                "path expands the hot bucket's c*(c-1)/2 ~= 50M pairs "
                "in ONE task; the production gate (SALT_MIN_SOURCE_"
                "ROWS=1M, BUCKET_MIN=4096, TARGET=2048) trips on the "
                "real row count and splits it S=5 ways. Pair counts "
                "asserted exactly equal between the paths (exactly-"
                "once replication). This is the tier the sf0.1 skew "
                "phase above cannot provide (its hot buckets are ~50 "
                "members, measuring only the machinery's fixed cost). "
                "Timed action = noop write (real row materialization, "
                "like any downstream consumer); count() would fuse the "
                "explosion into a codegen counter and hide the "
                "single-task bottleneck (~12x, measured). The "
                "salted_cms_sized row replaces the exact sizing "
                "shuffle with map-side probes of a pre-built bounded "
                "count-min grid (cms_size_grid) — the ingest-"
                "maintained-artifact deployment shape; one-sided "
                "estimates can only over-split, never miss a hot "
                "bucket, and pair parity is asserted for it too."
            ),
            "rows": n_hot_rows,
            "pairs": hot10k_unsalted[1],
            "unsalted_grouped_warm_sec": hot10k_unsalted[0],
            "salted_production_warm_sec": hot10k_salted[0],
            "salted_cms_sized_warm_sec": hot10k_cms[0],
            "salted_speedup": round(
                hot10k_unsalted[0] / hot10k_salted[0], 2
            )
            if hot10k_salted[0] > 0
            else None,
        },
    }
    path = Path(__file__).resolve().parent.parent / "SCALE_BENCH.json"
    path.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(json.dumps(out["queries"], indent=1))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
