"""Percentile operators: exact nearest-rank (reference semantics) + approx.

The reference computes percentiles by sorting all samples in memory and
indexing at round(p * (n-1)) (reference src/tests/integration_test.rs:
359-364). ``nearest_rank_percentiles`` reproduces that exactly and
deterministically; ``approx_percentiles`` is the 100 TB path (t-digest
via percentile_approx: one pass, mergeable sketches, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Budget for the exact path's single-task global sort. Catalyst's
# sizeInBytes estimate is free (no job); beyond this the operator
# refuses instead of silently funneling a cluster-scale sort through
# one task — callers switch to approx_percentiles (mergeable sketch)
# or nearest_rank_percentiles_by (per-key parallel sort).
EXACT_SORT_MAX_BYTES = 2 << 30


def _estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's estimated output size of the optimized plan, in bytes.

    Returns -1 when the estimate is unavailable OR not credible: leaves
    Catalyst cannot size (LogicalRDD, some in-memory relations) default
    to ``spark.sql.defaultSizeInBytes`` (Long.MaxValue out of the box),
    and join estimates MULTIPLY child sizes — so a bogus leaf inflates
    every plan above it. Gating on such a value would spuriously refuse
    small inputs on a public API; "don't know" must mean "don't gate",
    not "raise". Non-positive estimates, estimates past the 1 PiB
    sanity cap (which covers stock Long.MaxValue and its
    projection-scaled derivatives), and exact hits on
    defaultSizeInBytes (an unsized leaf echoing a lowered default) are
    treated as unknown; everything else — including large real
    estimates under a lowered default — keeps gating.
    """
    try:
        sess = df.sparkSession
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        est = int(str(stats.sizeInBytes()))
        try:
            default = int(sess.conf.get("spark.sql.defaultSizeInBytes"))
        except Exception:
            default = 9223372036854775807  # Long.MaxValue, the stock default
        # Equality with defaultSizeInBytes is NOT enough: Catalyst
        # SCALES a leaf's estimate by the projection's column-width
        # ratio, so a bogus Long.MaxValue leaf seen through a narrow
        # select lands just below it (measured: a 3-column LogicalRDD
        # projected to 1 column estimated 3.35e18 "bytes" for 100
        # rows). Anything past 1 PiB cannot be a real single-frame
        # estimate (a 100 TB table is 1e14) and is treated as unknown.
        #
        # But the >= comparison is only a bogosity signal when default
        # is the STOCK Long.MaxValue: a deployment that lowers
        # defaultSizeInBytes (a common broadcast-tuning knob) below the
        # gate budget would otherwise turn every genuinely-large real
        # estimate into "unknown" and silently skip the exact-sort
        # refusal. With a lowered default, only an EXACT hit (an
        # unsized leaf reporting the default verbatim) reads as
        # unknown; everything else is a real estimate and keeps gating.
        sanity_max = 1 << 50
        if est <= 0 or est > sanity_max or est == default:
            return -1
        return est
    except Exception:
        return -1


def nearest_rank_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles: list[tuple[str, float]],
    tiebreak: str | None = None,
) -> DataFrame:
    """One-row frame of exact nearest-rank percentiles of ``value_col``.

    Scale note: requires a total order over the column — a single-task
    sort of N rows. Exactness is only needed for oracle parity; use
    :func:`approx_percentiles` beyond memory scale. Enforced at
    runtime: inputs whose Catalyst-estimated size exceeds
    ``EXACT_SORT_MAX_BYTES`` raise rather than run the one-task sort.
    """
    cols = [value_col] + ([tiebreak] if tiebreak else [])
    est = _estimated_size_bytes(df.select(*cols))
    if est > EXACT_SORT_MAX_BYTES:
        raise ValueError(
            f"nearest_rank_percentiles: estimated input {est >> 20} MiB exceeds "
            f"the single-task exact-sort budget ({EXACT_SORT_MAX_BYTES >> 20} MiB). "
            "Use approx_percentiles (one-pass mergeable sketch) or "
            "nearest_rank_percentiles_by (per-key parallel sort) at this scale."
        )
    # HISTOGRAM-BASED SELECTION, not a row-level sort: the value at
    # nearest-rank r under (value, tiebreak) order is the value whose
    # cumulative count first reaches r — the tiebreak only permutes
    # rows WITHIN an equal-value run, which cannot change which value
    # covers a rank. So the heavy work is one fully-parallel
    # map-side-combined groupBy(value) (the ``tiebreak`` argument is
    # kept for API stability and documentation of the order the rank
    # refers to), and only the distinct-value histogram — typically
    # orders of magnitude smaller than the rows — flows through the
    # cumulative window. Degenerate worst case (all values distinct)
    # falls back to exactly the old row-level sort volume, which is
    # what the size gate above protects against.
    del tiebreak  # rank selection provably independent of tie order
    hist = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        F.col(value_col),
        F.col("__c"),
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(Window.partitionBy()).alias("__n"),
    )
    aggs = []
    for name, p in percentiles:
        r = F.round(F.lit(p) * (F.col("__n") - 1)).cast("bigint") + 1
        aggs.append(
            F.max(
                F.when(
                    (F.col("__cum") - F.col("__c") < r)
                    & (r <= F.col("__cum")),
                    F.col(value_col),
                )
            ).alias(name)
        )
    return cum.agg(*aggs)


def approx_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles: list[tuple[str, float]],
    accuracy: int = 10_000,
) -> DataFrame:
    """Sketch-based percentiles: single pass, mergeable, cluster-scale."""
    pcts = F.array(*[F.lit(p) for _, p in percentiles])
    arr = F.percentile_approx(value_col, pcts, F.lit(accuracy)).alias("__pcts")
    out = df.agg(arr)
    return out.select(
        *[F.element_at("__pcts", i + 1).alias(name) for i, (name, _) in enumerate(percentiles)]
    )


def nearest_rank_percentiles_by(
    df: DataFrame,
    key_col: str,
    value_col: str,
    percentiles: list[tuple[str, float]],
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-key exact nearest-rank percentiles — one row per key.

    Same semantics as :func:`nearest_rank_percentiles` with the sort
    scoped per key: the window sorts within each key's partition, so
    parallelism is per-key (the grouped form scales where the global
    form's single-task sort does not — the usual way exact percentiles
    survive at scale is exactly this, computing them per shard/tenant).
    """
    # Same histogram-based selection as the global form (see there for
    # the tie-order argument), scoped per key. This is the shape that
    # survives LOW-cardinality keys at scale: the old per-key
    # row_number window serialized each key's FULL row set through one
    # task (5 event types = 5 busy tasks on a 1000-executor cluster);
    # here the row-level pass is a fully-parallel map-side-combined
    # groupBy(key, value), and only the per-key distinct-value
    # histogram crosses the window.
    del tiebreak  # rank selection provably independent of tie order
    hist = df.groupBy(key_col, value_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        F.col(key_col),
        F.col(value_col),
        F.col("__c"),
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(Window.partitionBy(key_col)).alias("__n"),
    )
    aggs = []
    for name, p in percentiles:
        r = F.round(F.lit(p) * (F.col("__n") - 1)).cast("bigint") + 1
        aggs.append(
            F.max(
                F.when(
                    (F.col("__cum") - F.col("__c") < r)
                    & (r <= F.col("__cum")),
                    F.col(value_col),
                )
            ).alias(name)
        )
    aggs.append(F.max("__n").cast("bigint").alias("n"))
    return cum.groupBy(key_col).agg(*aggs)
