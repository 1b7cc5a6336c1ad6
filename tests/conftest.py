"""Shared fixtures: one SparkSession per test run + a DuckDB oracle.

The oracle harness mirrors the verification driver: run the Spark query
and the DuckDB SQL on the same parquet tables, then compare row count,
column-name set, and order-insensitive values (exact — stricter than the
driver's hash).
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from open_rust_timeseries_db_spark.session import get_spark  # noqa: E402
from open_rust_timeseries_db_spark.sources.catalog import TABLES  # noqa: E402

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _norm_cell(v):
    """Canonical string form so pandas dtype quirks don't cause false diffs."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)  # repr is shortest round-trip: bit-exact compare
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else list(v)
        return "[" + ",".join(_norm_cell(x) for x in seq) + "]"
    return str(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        out[c] = out[c].map(_norm_cell)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def assert_frames_match(
    got_pdf: pd.DataFrame, want_pdf: pd.DataFrame, name: str = "?"
):
    """Order-insensitive exact frame compare (the oracle discipline),
    usable against any expected frame — DuckDB result or a precomputed
    parquet oracle."""
    got = normalize(got_pdf)
    want = normalize(want_pdf)
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} oracle={len(want)}"
    if not got.equals(want):
        diff_mask = (got != want).any(axis=1)
        sample = pd.concat(
            {"spark": got[diff_mask].head(5), "oracle": want[diff_mask].head(5)}, axis=1
        )
        raise AssertionError(f"{name}: value mismatch on {int(diff_mask.sum())} rows\n{sample}")


def assert_oracle_match(spark_df, duck_con, oracle_sql: str, name: str = "?"):
    assert_frames_match(
        spark_df.toPandas(), duck_con.sql(oracle_sql).df(), name=name
    )
