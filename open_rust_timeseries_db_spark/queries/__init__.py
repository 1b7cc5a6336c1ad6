"""Oracle-checked query inventory (SURVEY.md §2 -> §7.3 manifest)."""

from open_rust_timeseries_db_spark.queries.registry import (
    DEC,
    FIXED_NOW_US,
    QuerySpec,
    all_queries,
    query,
)

__all__ = ["DEC", "FIXED_NOW_US", "QuerySpec", "all_queries", "query"]
