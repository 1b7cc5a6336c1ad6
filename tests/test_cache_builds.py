"""The bench's cache-build phase must actually cover the shared tables.

If a query materializes a session-cached artifact the build phase does
not list, its "cold" bench line silently absorbs a build again (the
round-3 mis-attribution the phase exists to fix). Contract: after all
builders run, the cache-heavy queries plan WITHOUT adding new ckpt
cache entries and without collect-memo misses.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)

import open_rust_timeseries_db_spark.functions.text_kernels as tk
from open_rust_timeseries_db_spark.queries import all_queries
from open_rust_timeseries_db_spark.queries.cache_builds import cache_builders
from tests.conftest import SF_DIR

# The queries whose plans hang off shared session artifacts.
CACHE_HEAVY = [
    "q_lm_score",
    "q_ngram_lm_bigrams",
    "q_repetition_ratio",
    "q_tfidf_topterms",
    "q_bm25_rank",
    "q_token_diversity",
    "q_dedup_near",
    "q_minhash_jaccard",
    "q_ngram_jaccard",
    "q_simhash",
    "q_winnow_neardup",
    "q_winnowing_fp",
    "q_contamination",
    "q_ann_ivf",
    "q_kmeans_update",
    "q_semantic_dedup",
]


def test_cache_builders_cover_query_artifacts(spark):
    specs = all_queries()
    builders = cache_builders(spark, SF_DIR)
    rows = {name: build() for name, build in builders.items()}
    assert all(n >= 0 for n in rows.values())

    n_entries = len(tk._CKPT_CACHE)
    for name in CACHE_HEAVY:
        specs[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
    assert len(tk._CKPT_CACHE) == n_entries, (
        "a cache-heavy query materialized a session artifact the build "
        "phase does not list: "
        f"{sorted(k[3:] for k in list(tk._CKPT_CACHE)[-(len(tk._CKPT_CACHE) - n_entries):])}"
    )
