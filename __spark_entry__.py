"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``open_rust_timeseries_db_spark``; this module is
the thin contract adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable no matter where the driver runs us from.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from open_rust_timeseries_db_spark.queries import all_queries  # noqa: E402
from open_rust_timeseries_db_spark.session import tune_session  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    VWAP per key over the tick-stream analog table — the reference's
    headline consumer analytic (SURVEY.md §2.2 C3).
    """
    tune_session(spark)
    return all_queries()["q_vwap_by_symbol"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def bind(name):
        spec = all_queries()[name]

        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return spec.fn(spark, sf_dir)

        run.__doc__ = spec.doc
        return run

    return {name: bind(name) for name in all_queries()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL per query (omitted => rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
