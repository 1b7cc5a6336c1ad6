"""Decompose q_dedup_clusters' COLD invocation into phases.

Mirrors bench.py's session state exactly (tuned session, bench confs,
session warmups, full cache-build phase), then times the cluster
pipeline phase by phase on its FIRST invocation:

  plan_pairs   - py4j build of the simhash pair pipeline (no jobs)
  adj_ckpt     - edges union + localCheckpoint(eager) job
  adj_count    - count over the checkpointed adjacency
  drain        - toLocalIterator over the edge list + union-find
  label_ship   - createDataFrame(mapping) + broadcast-join plan build
  final_noop   - the output noop write (sizes join + broadcast)

Usage: python scripts/cc_decomp_probe.py [sf_dir] [--repeat]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    import bench
    from open_rust_timeseries_db_spark.operators.graph import (
        _driver_union_find,
    )
    from open_rust_timeseries_db_spark.queries import all_queries
    from open_rust_timeseries_db_spark.session import get_spark
    from open_rust_timeseries_db_spark.sources.catalog import load_table

    raw_bytes = sum(f.stat().st_size for f in Path(sf_dir).glob("*.parquet"))
    n_cores = os.cpu_count() or 8
    sp = max(8, min(4 * n_cores, int(raw_bytes * 8 / (64 << 20)) or 1))
    spark = get_spark("cc-decomp", shuffle_partitions=sp)
    if raw_bytes * 8 < (256 << 20):
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.sparkContext.setLogLevel("ERROR")
    all_queries()
    bench.warmup_session(spark, sf_dir)
    from open_rust_timeseries_db_spark.queries.cache_builds import (
        cache_builders,
    )

    for bname, build in cache_builders(spark, sf_dir).items():
        build()

    out: dict[str, float] = {}

    def tick(name: str, t0: float) -> float:
        t1 = time.perf_counter()
        out[name] = round(t1 - t0, 4)
        return t1

    for pass_i in ("cold", "warm"):
        from open_rust_timeseries_db_spark.functions.text_kernels import (
            simhash_grouped_ckpt,
        )
        from open_rust_timeseries_db_spark.operators.dedupe import (
            simhash_pairs,
            simhash_signatures,
        )

        t0 = time.perf_counter()
        docs = load_table(spark, sf_dir, "documents")
        pairs = simhash_pairs(
            simhash_signatures(docs),
            max_hamming=3,
            grouped=simhash_grouped_ckpt(docs),
        )
        t0 = tick(f"{pass_i}.plan_pairs", t0)
        adj = (
            pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .union(
                pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
            )
            .localCheckpoint(eager=True)
        )
        t0 = tick(f"{pass_i}.adj_ckpt", t0)
        n_edges = adj.count()
        t0 = tick(f"{pass_i}.adj_count", t0)
        nodes = docs.select(F.col("doc_id").alias("node"))
        comp = _driver_union_find(nodes, adj, "node")
        t0 = tick(f"{pass_i}.union_find", t0)
        sizes = comp.groupBy("label").agg(
            F.count(F.lit(1)).alias("cluster_size")
        )
        res = comp.join(sizes, "label").select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("cluster_id"),
            "cluster_size",
            F.when(F.col("node") == F.col("label"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_canonical"),
        )
        res.write.format("noop").mode("overwrite").save()
        t0 = tick(f"{pass_i}.final_noop", t0)
        out[f"{pass_i}.n_edges"] = n_edges

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
