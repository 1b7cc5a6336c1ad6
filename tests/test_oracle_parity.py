"""Every registered query with an oracle must match DuckDB exactly.

This mirrors (and is stricter than) the driver's t2 correctness gate:
exact value equality after column-name sort + row sort, at
``TEST_SF_DIR`` (default sf0.001 for speed; set TEST_SF_DIR to sf0.01 to
reproduce the driver's scale).
"""

from __future__ import annotations

import pytest

from open_rust_timeseries_db_spark.queries import all_queries
from tests.conftest import SF_DIR, assert_oracle_match

QUERIES = all_queries()
ORACLE_CHECKED = sorted(n for n, s in QUERIES.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, duck, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    assert_oracle_match(df, duck, spec.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
