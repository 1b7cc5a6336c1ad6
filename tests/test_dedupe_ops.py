"""Dedup operator internals: the MinHash signature computation must
match the explode + groupBy ground truth per permutation.

Regression pin for a PySpark higher-order-function footgun: a
two-parameter lambda like ``transform(col, lambda s, i=i: ...)`` is
PySpark's documented (element, index) form — the ``i=i`` default is
IGNORED and ``i`` binds to the array index, so every perm computed the
same hash(index, shingle): P identical signatures, LSH banding
degraded to a single permutation. The operators keep HOF lambdas
single-parameter and fold a per-element hash array positionally; this
test fails if anyone reintroduces the closure idiom.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.functions.text import tokens, word_shingles
from open_rust_timeseries_db_spark.operators.dedupe import (
    MINHASH_PERMS,
    shingle_profile,
)
from open_rust_timeseries_db_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


def test_minhash_signatures_match_grouped_truth(spark):
    docs = load_table(spark, SF_DIR, "documents")
    prof = {r["id"]: r for r in shingle_profile(docs).collect()}

    exploded = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(word_shingles(tokens("text")))).alias("sh"),
    )
    truth_rows = exploded.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), "sh")).alias(f"t{i}")
            for i in range(MINHASH_PERMS)
        ]
    ).collect()
    assert len(truth_rows) == len(prof)
    n_distinct_total = 0
    for t in truth_rows:
        got = [prof[t["id"]][f"sig_{i}"] for i in range(MINHASH_PERMS)]
        want = [t[f"t{i}"] for i in range(MINHASH_PERMS)]
        assert got == want, f"doc {t['id']}: sigs diverge from grouped truth"
        n_distinct_total += len(set(got))
    # The collapse bug made every doc's P sigs identical; real sigs are
    # (essentially always) distinct per perm.
    assert n_distinct_total > len(truth_rows) * (MINHASH_PERMS // 2)
