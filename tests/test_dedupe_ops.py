"""Dedup operator internals: the Arrow-kernel MinHash signatures must
match the explode + groupBy JVM ground truth per permutation.

The kernel (functions/text_kernels.shingle_profile_pd) computes
md5-base + affine-permutation signatures in numpy; the ground truth
here recomputes them with pure JVM expressions (split/shingle/md5/conv
+ min over exploded shingles). Any divergence — tokenization, shingle
de-dup, hex-prefix extraction, affine arithmetic, or the historical
HOF (element, index) lambda trap — fails this test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.functions.text import tokens, word_shingles
from open_rust_timeseries_db_spark.functions.text_kernels import MH_AB, MH_P
from open_rust_timeseries_db_spark.operators.dedupe import (
    MINHASH_PERMS,
    shingle_profile,
)
from open_rust_timeseries_db_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


def test_minhash_signatures_match_grouped_truth(spark):
    docs = load_table(spark, SF_DIR, "documents")
    prof = {r["id"]: r for r in shingle_profile(docs).collect()}

    base = F.conv(F.substring(F.md5("sh"), 1, 8), 16, 10).cast("bigint")
    exploded = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(word_shingles(tokens("text")))).alias("sh"),
    ).select("id", base.alias("h"))
    truth_rows = exploded.groupBy("id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MH_P)).alias(f"t{i}")
            for i, (a, b) in enumerate(MH_AB[:MINHASH_PERMS])
        ]
    ).collect()
    assert len(truth_rows) == len(prof)
    n_distinct_total = 0
    for t in truth_rows:
        got = [prof[t["id"]][f"sig_{i}"] for i in range(MINHASH_PERMS)]
        want = [t[f"t{i}"] for i in range(MINHASH_PERMS)]
        assert got == want, f"doc {t['id']}: sigs diverge from grouped truth"
        n_distinct_total += len(set(got))
    # A degenerate family (or the historical (element, index) HOF lambda
    # trap) makes every doc's P sigs identical; real sigs are
    # (essentially always) distinct per perm.
    assert n_distinct_total > len(truth_rows) * (MINHASH_PERMS // 2)


def test_simhash_kernel_matches_jvm_truth(spark):
    from open_rust_timeseries_db_spark.operators.dedupe import simhash_signatures

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    got = {r["doc_id"]: r["sig"] for r in simhash_signatures(docs).collect()}

    hashes = docs.select(
        F.col("doc_id"), F.explode(tokens("text")).alias("tok")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint").alias("h"),
    )
    votes = hashes.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"v_{j}")
            for j in range(32)
        ]
    )
    sig = None
    for j in range(32):
        term = F.when(F.col(f"v_{j}") > 0, F.lit(2**j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = term if sig is None else sig + term
    want = {r["doc_id"]: r["sig"] for r in votes.select("doc_id", sig.alias("sig")).collect()}
    assert got == want


def test_kernel_cache_repeat_invocation_stable(spark):
    """The session-scoped kernel materialization cache must hand back
    the same rows on a cache hit as the original computation (and the
    second invocation must reuse, not recompute — asserted indirectly:
    identical results across invocations)."""
    from open_rust_timeseries_db_spark.queries import all_queries

    qs = all_queries()
    first = {tuple(r) for r in qs["q_minhash_jaccard"].fn(spark, SF_DIR).collect()}
    second = {tuple(r) for r in qs["q_minhash_jaccard"].fn(spark, SF_DIR).collect()}
    assert first == second and len(first) > 0
