"""Every registered query with an oracle must match DuckDB exactly.

This mirrors (and is stricter than) the driver's t2 correctness gate:
exact value equality after column-name sort + row sort, at
``TEST_SF_DIR`` (default sf0.001 for speed; set TEST_SF_DIR to sf0.01 to
reproduce the driver's scale).
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
import pytest

from open_rust_timeseries_db_spark.queries import all_queries
from tests.conftest import SF_DIR, assert_frames_match, assert_oracle_match

QUERIES = all_queries()
ORACLE_CHECKED = sorted(n for n, s in QUERIES.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if not s.oracle)


def _cluster_cte_intractable() -> bool:
    """True where the recursive-CTE cluster oracle cannot run (the sf1
    tier: transitive closure >45 min at 50k docs). Keyed on CORPUS
    SIZE, deliberately not on the precomputed parquet's presence —
    gen_sf1 writes that file for every tier it generates, and
    presence-keying would both switch the parity check to the
    union-find oracle AND skip the bridge test below on a regenerated
    small tier, leaving the union-find oracle self-certifying."""
    import pyarrow.parquet as pq

    try:
        meta = pq.read_metadata(Path(SF_DIR) / "documents.parquet")
        return meta.num_rows > 20_000
    except Exception:
        return False


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, duck, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    if name == "q_dedup_clusters" and _cluster_cte_intractable():
        # Intractable-CTE tiers ship a precomputed union-find oracle
        # next to the parquet (scripts/gen_sf1.expected_dedup_clusters);
        # its faithfulness to the CTE oracle is asserted by the bridge
        # test below at every tractable tier.
        exp = Path(SF_DIR) / "expected_dedup_clusters.parquet"
        assert exp.exists(), (
            "CTE oracle intractable at this tier and no precomputed "
            "union-find oracle shipped; regenerate with scripts/gen_sf1.py"
        )
        assert_frames_match(df.toPandas(), pd.read_parquet(exp), name=name)
        return
    assert_oracle_match(df, duck, spec.oracle, name=name)


@pytest.mark.skipif(
    _cluster_cte_intractable(),
    reason="recursive-CTE oracle intractable at this tier; the bridge "
    "is asserted at every tractable tier",
)
def test_precomputed_cluster_oracle_matches_recursive_cte(duck):
    """The union-find oracle (used where the CTE is intractable) must
    agree bit-for-bit with the recursive-CTE oracle where BOTH run."""
    import importlib.util

    gen_path = Path(__file__).resolve().parent.parent / "scripts" / "gen_sf1.py"
    mspec = importlib.util.spec_from_file_location("gen_sf1", gen_path)
    gen_sf1 = importlib.util.module_from_spec(mspec)
    mspec.loader.exec_module(gen_sf1)

    docs = pd.read_parquet(Path(SF_DIR) / "documents.parquet")
    got = gen_sf1.expected_dedup_clusters(
        docs["doc_id"].to_numpy(), docs["text"].tolist()
    ).to_pandas()
    assert_frames_match(
        got,
        duck.sql(QUERIES["q_dedup_clusters"].oracle).df(),
        name="precomputed_cluster_oracle",
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
