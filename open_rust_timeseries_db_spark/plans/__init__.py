"""Physical-plan inspection utilities (plan-quality gates).

The reference has no optimizer at all (SURVEY.md §4.1); this engine
delegates optimization to Catalyst/AQE and then ASSERTS the properties
it relies on — filters pushed to the parquet scan, column-pruned
ReadSchema, broadcast joins for small dims, whole-stage codegen in hot
paths, bounded shuffle counts. tests/test_plans.py runs these gates so
a plan regression fails CI, not the 100 TB run.
"""

from open_rust_timeseries_db_spark.plans.inspect import (
    count_exchanges,
    has_broadcast_hash_join,
    has_python_eval,
    has_wholestage_codegen,
    plan_string,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "count_exchanges",
    "has_broadcast_hash_join",
    "has_python_eval",
    "has_wholestage_codegen",
    "plan_string",
    "pushed_filters",
    "read_schemas",
]
