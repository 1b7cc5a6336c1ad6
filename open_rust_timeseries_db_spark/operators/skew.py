"""Skew mitigation: salted aggregation and replicate-salted joins.

AQE's skew-join splitting (on in session.py) handles skewed SORT-MERGE
JOIN partitions automatically — prefer it. Salting is for the cases AQE
does not cover:

- **hash aggregation on a heavy key**: one key with 10^9 rows lands on
  one reducer regardless of AQE. Two-phase salted aggregation spreads
  phase 1 over ``n_salts`` reducers, then re-aggregates the tiny
  partials.
- **joins where the probe side must stay put** (e.g. streaming state):
  replicate the build side per salt instead.

Salt choice: ``spark_partition_id() % n_salts`` — free (no hash of row
data), deterministic within an execution, and uniform because upstream
partitioning is. Any salt distribution is CORRECT (the final
re-aggregation merges partials regardless); distribution only affects
balance.

The reference sidesteps skew entirely — one ring per field, one
consumer set (SURVEY.md §4.2 power-of-two bitmask indexing is uniform
by construction). At 100 TB real keys are Zipfian; this is the designed
answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str | Column,
    n_salts: int = 16,
    sum_alias: str = "sum_value",
    count_alias: str = "n",
    exact_decimal: str | None = "decimal(38,6)",
) -> DataFrame:
    """Two-phase (salted) sum+count per key, safe for Zipfian keys.

    Phase 1 aggregates (key, salt) — heavy keys fan out over n_salts
    reducers; phase 2 merges the <= n_salts partials per key. Decimal
    accumulation keeps the two-phase double sum bit-equal to a
    single-phase one (float addition is not associative; decimal is).
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    if exact_decimal:
        value = value.cast(exact_decimal)
    partial = (
        df.withColumn(_SALT, F.spark_partition_id() % n_salts)
        .groupBy(*keys, _SALT)
        .agg(F.sum(value).alias("__psum"), F.count(F.lit(1)).alias("__pn"))
    )
    out = partial.groupBy(*keys).agg(
        F.sum("__psum").alias("__sum"), F.sum("__pn").alias(count_alias)
    )
    total = F.col("__sum").cast("double") if exact_decimal else F.col("__sum")
    return out.select(*keys, total.alias(sum_alias), F.col(count_alias))


def replicate_salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the build side replicated once per salt.

    The probe side gets a free per-row salt; the build side is
    cross-joined with [0..n_salts) so every (key, salt) bucket finds its
    build rows. Result set is identical to ``probe.join(build, on)``;
    the heavy probe key now spreads over n_salts shuffle partitions.
    Cost: build side shuffles n_salts x — use when build << probe and
    the probe key histogram is Zipfian (else plain join + AQE wins).

    Only ``inner`` and ``left`` are salt-equivalent to the plain join:
    with right/full outer, a build row unmatched in one salt bucket
    would surface once per salt as n_salts null-extended duplicates,
    so those modes are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "replicate_salted_join supports how in ('inner', 'left'); "
            f"got {how!r} — outer modes would duplicate unmatched build "
            "rows once per salt"
        )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(_SALT)
    build_rep = build.select("*", salts)
    probe_salted = probe.withColumn(_SALT, F.spark_partition_id() % n_salts)
    return probe_salted.join(build_rep, on=[*on, _SALT], how=how).drop(_SALT)
