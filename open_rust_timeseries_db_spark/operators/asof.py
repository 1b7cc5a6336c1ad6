"""As-of (backward) join — the time-series staple Spark has no built-in for.

Semantics: for each left row, attach the most recent right row of the
same key with ``right_ts <= left_ts`` (ties on the timestamp include the
right row). Matches DuckDB's ``ASOF JOIN ... ON l.k = r.k AND l.ts >=
r.ts``. The reference's domain (market ticks) begs for this operator but
never implements it (SURVEY.md §2.3).

Strategy (union + ordered window, one shuffle):
  1. tag right rows 0 and left rows 1,
  2. union on (key, ts, tag, payload),
  3. ``last(right_payload, ignorenulls=True)`` over a window partitioned
     by key, ordered by (ts, tag, tiebreak), rows unbounded-preceding..current,
  4. keep left rows.

Cost at scale: exactly one hash-partition-by-key + in-partition sort —
the same shuffle class as a sort-merge join of the two inputs; no
range-explosion like a naive inequality join (which Spark would execute
as a broadcast-nested-loop). Skewed keys degrade to single-partition
sorts; pre-split hot keys by time-bucket if a key exceeds executor
memory (not needed at testdata scales).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    tiebreak: str | None = None,
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """As-of join of ``left`` to ``right`` on key ``on``.

    ``direction="backward"`` (default) attaches the most recent right
    row with ``right_ts <= left_ts``; ``direction="forward"`` attaches
    the nearest following right row with ``right_ts >= left_ts`` (DuckDB
    ``ASOF JOIN ... ON l.ts <= r.ts``). Forward is backward on reversed
    time: the only change is the window's timestamp sort order — cost
    and shuffle shape are identical.

    ``right_values`` are carried to the output as ``asof_<name>``;
    ``asof_ts`` carries the matched right timestamp. ``how`` is
    ``"inner"`` (drop left rows with no match) or ``"left"``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    l_cols = left.columns
    # Right rows carry the tiebreak so equal-ts right duplicates have a
    # deterministic winner (the greatest tiebreak value); it must be
    # captured HERE, while the right DataFrame's own columns are still
    # in scope.
    lhs_tb = [F.lit(None).cast("long").alias("__tb")] if tiebreak else []
    rhs_tb = [F.col(tiebreak).cast("long").alias("__tb")] if tiebreak else []
    lhs = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).cast("long").alias("__ts"),
        F.lit(1).alias("__tag"),
        F.struct(*l_cols).alias("__left"),
        F.lit(None).cast("long").alias("__rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}") for c in right_values],
        *lhs_tb,
    )
    rhs = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(left.select(F.struct(*l_cols)).schema[0].dataType).alias("__left"),
        F.col(right_ts).cast("long").alias("__rts"),
        *[F.col(c).alias(f"__rv_{c}") for c in right_values],
        *rhs_tb,
    )

    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    # __tag stays ascending in both directions: at the boundary
    # timestamp the right row (tag 0) must precede the left row so the
    # equal-ts match is included in the preceding frame.
    order: list[Column] = [ts_order, F.col("__tag")]
    if tiebreak is not None:
        order.append(F.col("__tb").asc_nulls_first())

    unioned = lhs.unionByName(rhs)
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.select(
        "__left",
        F.last("__rts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"__rv_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_values
        ],
    ).filter(F.col("__left").isNotNull())

    out = matched.select("__left.*", "asof_ts", *[f"asof_{c}" for c in right_values])
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out
