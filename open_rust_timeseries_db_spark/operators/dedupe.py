"""Near-duplicate detection operators: MinHash-LSH and SimHash.

Both are built from plain DataFrame ops (explode / hash / min-agg /
band-join) rather than spark.ml, so they stay deterministic, schema-
stable, and fully plannable by Catalyst. Shapes:

- MinHash-LSH: doc -> shingles -> P permuted min-hashes -> B banded
  bucket keys -> bucket self-join -> candidate pairs. Linear in corpus
  size (the bucket join only pairs docs sharing a band) — the 100 TB
  near-dup path.
- SimHash: doc -> token hashes -> 32-bit majority signature -> byte-band
  blocking -> Hamming filter. With 4 bands, Hamming <= 3 has perfect
  recall (pigeonhole).

Plan-shape notes (these bit hard at bench time):
- token/shingle arrays are materialized as columns before any
  per-element use, so lambdas see attribute references, never a
  re-evaluated expression subtree;
- band rows come from one ``explode`` over a literal-built array — a
  union of B selects re-runs the whole signature aggregation B times
  per side of the self-join.

The reference stores opaque byte payloads and has no dedup at all
(SURVEY.md §2.4); these operators are the driver-mandated extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.functions.text import tokens, word_shingles

# 16 permutations in 4 bands of 4 rows: P(candidate | jaccard j) =
# 1 - (1 - j^4)^4 — steep around j ~ 0.5.
MINHASH_PERMS = 16
MINHASH_BANDS = 4


def _doc_shingles(
    docs: DataFrame, id_col: str, text_col: str, out: str = "sh"
) -> DataFrame:
    """(id_col, sh): one row per distinct shingle per document."""
    toked = docs.select(F.col(id_col), tokens(text_col).alias("_toks"))
    shingled = toked.select(
        F.col(id_col),
        F.array_distinct(word_shingles(F.col("_toks"))).alias("_shs"),
    )
    return shingled.select(F.col(id_col), F.explode("_shs").alias(out))


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sig_0..sig_P-1): min of xxhash64(perm-seed, shingle) per perm.

    One explode + one hash-agg keyed by doc id; every permutation is a
    column, not a pass — the corpus is read once.
    """
    sh = _doc_shingles(docs, id_col, text_col)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"sig_{i}")
        for i in range(MINHASH_PERMS)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def _banded(sigs: DataFrame, id_col: str) -> DataFrame:
    """(id, band, bucket): one exploded row per LSH band."""
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.col(f"sig_{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ]
                ).alias("bucket"),
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    return sigs.select(
        F.col(id_col).alias("id"), F.explode(band_structs).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Banded bucket join -> distinct (a, b) candidate pairs, a < b."""
    bands = _banded(sigs, id_col)
    left = bands.select(F.col("id").alias("a"), "band", "bucket")
    right = bands.select(F.col("id").alias("b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def exact_jaccard(
    docs: DataFrame,
    pairs: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact shingle-set Jaccard per document pair.

    With ``pairs`` given, verifies exactly those candidates; with
    ``pairs=None`` the shingle equi-join itself generates the pairs —
    only documents sharing at least one shingle ever meet, so there is
    no N^2 blow-up either way. All integer set arithmetic, so the
    similarity is engine-deterministic.
    """
    # Shuffle the 8-byte xxhash64 of each shingle, not the shingle
    # string — same intersection counts (collisions are ~n^2/2^64); the
    # distinct-shingle sets being hashed are exact, so sizes are exact.
    toked = docs.select(F.col(id_col).alias("id"), tokens(text_col).alias("_toks"))
    arrays = toked.select(
        "id", F.array_distinct(word_shingles(F.col("_toks"))).alias("_shs")
    )
    sizes = arrays.select("id", F.size("_shs").cast("bigint").alias("n_sh"))
    sh = arrays.select("id", F.explode("_shs").alias("sh")).select(
        "id", F.xxhash64("sh").alias("hs")
    )
    if pairs is None:
        # Pair generation without a self-join: group each shingle's
        # doc-id list (ONE shuffle of the exploded shingles, computed
        # once — a self-join shuffles them twice and recomputes the
        # tokenizer per side), then emit ordered pairs inline. Per-array
        # work is O(c^2) where c = docs sharing the shingle — bounded
        # and tiny; a genuinely hot shingle is exactly the case where
        # the self-join explodes too, and AQE skew-split still applies
        # to the final (a,b) aggregation.
        groups = sh.groupBy("hs").agg(F.collect_list("id").alias("ids"))
        pair_arr = F.filter(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x: F.transform(
                        F.col("ids"),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            ),
            lambda p: p["a"] < p["b"],
        )
        inter = (
            groups.filter(F.size("ids") > 1)
            .select(F.explode(pair_arr).alias("p"))
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        sh_a = sh.select(F.col("id").alias("a"), F.col("hs"))
        sh_b = sh.select(F.col("id").alias("b"), F.col("hs"))
        inter = (
            pairs.join(sh_a, "a")
            .join(sh_b, ["b", "hs"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    na = sizes.select(F.col("id").alias("a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("id").alias("b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            "n_inter",
            "n_a",
            "n_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """(id, sig): per-token md5-derived hash -> bitwise majority vote.

    md5 (not xxhash64) so a DuckDB oracle can reproduce the signature
    bit-for-bit: h = first 15 hex chars of md5(token) as a 60-bit int.
    Tokens are pre-counted per (doc, token) so the expensive md5+conv
    runs once per distinct token per doc, and the majority vote weights
    by multiplicity — identical result, fewer hashed rows.
    """
    tok_counts = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
        )
    )
    votes = tok_counts.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1,
                    F.col("cnt"),
                ).otherwise(-F.col("cnt"))
            ).alias(f"v_{j}")
            for j in range(bits)
        ]
    )
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"v_{j}") > 0, F.lit(2**j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = term if sig is None else sig + term
    return votes.select(F.col(id_col), sig.alias("sig"))


def simhash_pairs(sigs: DataFrame, id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Byte-band blocked pairs with Hamming(sig_a, sig_b) <= max_hamming.

    4 byte-bands over 32 bits: any pair within Hamming 3 must agree on
    at least one full byte, so the band join loses nothing.
    """
    band_structs = F.array(
        *[
            F.struct(
                F.lit(k).alias("band"),
                F.shiftright(F.col("sig"), 8 * k)
                .bitwiseAND(F.lit(255))
                .alias("byte"),
            )
            for k in range(4)
        ]
    )
    bands = sigs.select(
        F.col(id_col).alias("id"), F.col("sig"), F.explode(band_structs).alias("bb")
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.byte").alias("byte"))
    left = bands.select(F.col("id").alias("a"), F.col("sig").alias("sig_a"), "band", "byte")
    right = bands.select(F.col("id").alias("b"), F.col("sig").alias("sig_b"), "band", "byte")
    cand = (
        left.join(right, ["band", "byte"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .distinct()
    )
    return cand.select(
        "a",
        "b",
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("bigint").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
