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
    not "raise". Any estimate at or above defaultSizeInBytes (or
    non-positive) is treated as unknown.
    """
    try:
        sess = df.sparkSession
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        est = int(str(stats.sizeInBytes()))
        try:
            default = int(sess.conf.get("spark.sql.defaultSizeInBytes"))
        except Exception:
            default = 9223372036854775807  # Long.MaxValue, the stock default
        if est <= 0 or est >= default:
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
    order = [F.col(value_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.orderBy(*order)
    ranked = df.select(
        F.col(value_col),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("__n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("__rn")
                == F.round(F.lit(p) * (F.col("__n") - 1)).cast("bigint") + 1,
                F.col(value_col),
            )
        ).alias(name)
        for name, p in percentiles
    ]
    return ranked.agg(*aggs)


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
    order = [F.col(value_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    ranked = df.select(
        F.col(key_col),
        F.col(value_col),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(key_col)).alias("__n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("__rn")
                == F.round(F.lit(p) * (F.col("__n") - 1)).cast("bigint") + 1,
                F.col(value_col),
            )
        ).alias(name)
        for name, p in percentiles
    ] + [F.max("__n").cast("bigint").alias("n")]
    return ranked.groupBy(key_col).agg(*aggs)
