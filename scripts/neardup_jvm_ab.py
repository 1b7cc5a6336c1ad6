"""Interleaved A/B: blocked_neardup's applyInPandas numpy pair kernel
vs a pure-JVM expression formulation (group-collect + inline ordered
pair expansion + higher-order-function fixed-point cosine).

The numpy kernel pays the Python/Arrow boundary (~40% of its wall time
at 2,000 rows, measured round 12) but forms the O(B^2) pair matrix in
vectorized native code; the JVM variant never leaves the executor but
materializes each pair's two vectors through codegen'd HOFs. This probe
decides which wins at the sf1 tier (20,000 x 64), bit-comparing outputs
first. Usage: python scripts/neardup_jvm_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def blocked_neardup_jvm(
    emb,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
):
    """JVM-expression twin of functions.vectors.blocked_neardup: same
    fixed-point arithmetic (floor(a*b*1e12) int64 sums -> exact, order-
    free), pairs expanded inline from per-block collected arrays (the
    repo's established _expand_pairs shape), cosine via zip_with +
    aggregate. No Python workers anywhere."""
    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    gs = base.groupBy("blk").agg(
        F.sort_array(F.collect_list(F.struct("id", "v"))).alias("ms")
    )
    pairs = (
        gs.select("blk", F.posexplode("ms").alias("i", "m"), "ms")
        .select(
            "blk",
            F.col("m.id").alias("vec_a"),
            F.col("m.v").alias("va"),
            F.explode(
                F.slice("ms", F.col("i") + 2, F.size("ms") - F.col("i") - 1)
            ).alias("mb"),
        )
        .select(
            "blk",
            "vec_a",
            "va",
            F.col("mb.id").alias("vec_b"),
            F.col("mb.v").alias("vb"),
        )
    )
    fx = F.lit(1e12)
    zero = F.lit(0).cast("bigint")
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: F.floor(x * y * fx)),
        zero,
        lambda acc, x: acc + x,
    )
    n2a = F.aggregate(
        F.transform("va", lambda x: F.floor(x * x * fx)), zero,
        lambda acc, x: acc + x,
    )
    n2b = F.aggregate(
        F.transform("vb", lambda x: F.floor(x * x * fx)), zero,
        lambda acc, x: acc + x,
    )
    cos = (dot.cast("double") / fx) / (
        F.sqrt(n2a.cast("double") / fx) * F.sqrt(n2b.cast("double") / fx)
    )
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.col("blk").alias(block_col),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def main() -> None:
    import bench
    from open_rust_timeseries_db_spark.functions.vectors import (
        blocked_neardup,
    )
    from open_rust_timeseries_db_spark.queries import all_queries
    from open_rust_timeseries_db_spark.session import get_spark
    from open_rust_timeseries_db_spark.sources.catalog import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    raw_bytes = sum(f.stat().st_size for f in Path(sf_dir).glob("*.parquet"))
    n_cores = os.cpu_count() or 8
    sp = max(8, min(4 * n_cores, int(raw_bytes * 8 / (64 << 20)) or 1))
    spark = get_spark("neardup-jvm-ab", shuffle_partitions=sp)
    mpb = max(4 << 20, int(raw_bytes / (2 * n_cores)))
    if raw_bytes * 8 >= (256 << 20) and mpb < (128 << 20):
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
        spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 19))
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", str(mpb)
        )
    if raw_bytes * 8 < (256 << 20):
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.sparkContext.setLogLevel("ERROR")
    all_queries()
    bench.warmup_session(spark, sf_dir)
    from open_rust_timeseries_db_spark.queries.cache_builds import (
        cache_builders,
    )

    for _, build in cache_builders(spark, sf_dir).items():
        build()

    emb = load_table(spark, sf_dir, "embeddings")
    out: dict[str, object] = {"sf_dir": sf_dir}

    variants = {
        "pandas": lambda: blocked_neardup(emb, block_col="label",
                                          threshold=0.4),
        "jvm": lambda: blocked_neardup_jvm(emb, block_col="label",
                                           threshold=0.4),
    }
    # Equality via a DISTRIBUTED order-free checksum (count + decimal
    # sum of per-row xxhash64) — at sf1 the pair set is millions of
    # rows, far too many for a driver collect compare.
    def checksum(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("vec_a", "vec_b", "label", "cosine")
                .cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"] or 0)

    sums = {k: checksum(v()) for k, v in variants.items()}
    out["checksums"] = {k: list(v) for k, v in sums.items()}
    out["outputs_identical"] = sums["pandas"] == sums["jvm"]
    out["n_pairs"] = sums["pandas"][0]
    assert out["outputs_identical"], "JVM cosine diverges from numpy kernel"

    # The interpreted-HOF variant is minutes per pass at sf1, so it
    # gets ONE timed pass (enough for a rejection verdict); the
    # incumbent gets three.
    for k, n_pass in (("pandas", 3), ("jvm", 1)):
        for i in range(n_pass):
            spark.sparkContext.setJobDescription(f"neardup-ab {k} pass{i}")
            t0 = time.perf_counter()
            variants[k]().write.format("noop").mode("overwrite").save()
            out.setdefault(f"{k}.sec", []).append(
                round(time.perf_counter() - t0, 3)
            )
    spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
