"""Interleaved A/B at sf1: q_dedup_clusters with the full simhash pair
enumeration (old) vs connectivity-equivalent pairs (new), same session.

Asserts the two outputs are IDENTICAL row sets before reporting times.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
from open_rust_timeseries_db_spark.functions.text_kernels import (
    simhash_grouped_ckpt,
)
from open_rust_timeseries_db_spark.operators.dedupe import (
    simhash_connectivity_pairs,
    simhash_pairs,
    simhash_signatures,
)
from open_rust_timeseries_db_spark.operators.graph import connected_components
from open_rust_timeseries_db_spark.queries import all_queries
from open_rust_timeseries_db_spark.session import get_spark
from open_rust_timeseries_db_spark.sources.catalog import load_table
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
raw_bytes = sum(f.stat().st_size for f in Path(sf_dir).glob("*.parquet"))
n_cores = os.cpu_count() or 8
sp = max(8, min(4 * n_cores, int(raw_bytes * 8 / (64 << 20)) or 1))
spark = get_spark("cc-sf1-ab", shuffle_partitions=sp)
mpb = max(4 << 20, int(raw_bytes / (2 * n_cores)))
if raw_bytes * 8 >= (256 << 20) and mpb < (128 << 20):
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 19))
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(mpb))
if raw_bytes * 8 < (256 << 20):
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
spark.sparkContext.setLogLevel("ERROR")
all_queries()
bench.warmup_session(spark, sf_dir)
from open_rust_timeseries_db_spark.queries.cache_builds import cache_builders

for bname, build in cache_builders(spark, sf_dir).items():
    build()

docs = load_table(spark, sf_dir, "documents")
out: dict[str, object] = {}


def run(variant: str):
    sigs = simhash_signatures(docs)
    grouped = simhash_grouped_ckpt(docs)
    if variant == "full":
        pairs = simhash_pairs(sigs, max_hamming=3, grouped=grouped)
    else:
        pairs = simhash_connectivity_pairs(sigs, max_hamming=3, grouped=grouped)
    comp = connected_components(
        docs.select(F.col("doc_id").alias("node")),
        pairs.select("a", "b"),
        with_sizes=True,
    )
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
        F.when(F.col("node") == F.col("label"), 1).otherwise(0)
        .cast("bigint").alias("is_canonical"),
    )


# Edge counts first (untimed, also warms file pages for both variants).
for v in ("full", "conn"):
    sigs = simhash_signatures(docs)
    grouped = simhash_grouped_ckpt(docs)
    p = (simhash_pairs if v == "full" else simhash_connectivity_pairs)(
        sigs, max_hamming=3, grouped=grouped
    )
    out[f"{v}.n_pairs"] = p.count()

# Equivalence: identical row sets.
rows_full = sorted(map(tuple, run("full").collect()))
rows_conn = sorted(map(tuple, run("conn").collect()))
assert rows_full == rows_conn, "OUTPUT DIVERGES"
out["outputs_identical"] = True
out["n_rows"] = len(rows_full)

# Interleaved timing, 3 passes each.
for i in range(3):
    for v in ("full", "conn"):
        spark.sparkContext.setJobDescription(f"cc-ab {v} pass{i}")
        t0 = time.perf_counter()
        run(v).write.format("noop").mode("overwrite").save()
        out.setdefault(f"{v}.sec", []).append(
            round(time.perf_counter() - t0, 3)
        )
spark.sparkContext.setJobDescription(None)
print(json.dumps(out, indent=1))
spark.stop()
