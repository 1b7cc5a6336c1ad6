"""Similarity search over ``embeddings`` (SURVEY.md §2.4): brute-force
cosine top-k as the correctness baseline, IVF-style cluster assignment
as the scale path.

All vector math is the fixed-point fold from functions/vectors.py —
JVM-side zip_with/aggregate expressions, no Python UDFs, bit-identical
to the DuckDB oracle's unnest-based formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.functions.vectors import (
    ivf_assign,
    local_topk_cosine,
    sql_fx_sum,
)
from open_rust_timeseries_db_spark.queries.registry import query
from open_rust_timeseries_db_spark.sources.catalog import load_table

_NORMS_CTE = f"""
    elems AS (
      SELECT vec_id, label, unnest(embedding) AS e,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ), norms AS (
      SELECT vec_id, {sql_fx_sum("CAST(e AS DOUBLE) * CAST(e AS DOUBLE)")} AS n2
      FROM elems GROUP BY vec_id
    )
"""


@query(
    "q_cosine_topk",
    f"""
    WITH {_NORMS_CTE}, dots AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             {sql_fx_sum("CAST(q.e AS DOUBLE) * CAST(e.e AS DOUBLE)")} AS dot
      FROM elems q
      JOIN elems e ON q.i = e.i AND q.vec_id < 10 AND e.vec_id <> q.vec_id
      GROUP BY 1, 2
    ), cos AS (
      SELECT query_id, neighbor_id,
             (d.dot / 1e12) / (SQRT(nq.n2 / 1e12) * SQRT(ne.n2 / 1e12)) AS cosine
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.query_id
      JOIN norms ne ON ne.vec_id = d.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rnk FROM (
      SELECT query_id, neighbor_id, cosine,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
             ) AS BIGINT) AS rnk
      FROM cos)
    WHERE rnk <= 5
    """,
    doc="Brute-force cosine top-k: 10 query vectors (vec_id < 10, "
    "broadcast) against the corpus, top-5 each. The exact baseline every "
    "ANN variant is measured against. Scale: O(Q*N) with Q broadcast — "
    "fine for small query sets; for large Q use q_ann_ivf's cells.",
    tags=("similarity", "topk"),
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Distributed top-k: each task emits only its LOCAL top-5 per query
    # (O(tasks*Q*k) survivors instead of O(N*Q) scored pairs); the
    # global window ranks the tiny survivor set. The query matrix rides
    # in the task closure — no crossJoin.
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    local = local_topk_cosine(emb, queries_df, k=5)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        local.select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


@query(
    "q_ann_ivf",
    f"""
    WITH {_NORMS_CTE}, dots AS (
      SELECT v.vec_id AS vec_id, c.vec_id AS centroid_id,
             {sql_fx_sum("CAST(v.e AS DOUBLE) * CAST(c.e AS DOUBLE)")} AS dot
      FROM elems v
      JOIN elems c ON v.i = c.i AND c.vec_id % 100 = 0
      GROUP BY 1, 2
    ), cos AS (
      SELECT d.vec_id AS vec_id, d.centroid_id AS centroid_id,
             (d.dot / 1e12) / (SQRT(nv.n2 / 1e12) * SQRT(nc.n2 / 1e12)) AS cosine
      FROM dots d
      JOIN norms nv ON nv.vec_id = d.vec_id
      JOIN norms nc ON nc.vec_id = d.centroid_id
    ), assigned AS (
      SELECT vec_id, centroid_id, cosine,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id ORDER BY cosine DESC, centroid_id
             ) AS rn
      FROM cos
    )
    SELECT centroid_id, COUNT(*) AS n_members,
           MIN(cosine) AS min_cos, MAX(cosine) AS max_cos
    FROM assigned WHERE rn = 1
    GROUP BY centroid_id
    """,
    doc="IVF-style coarse quantization: every vector assigned to its "
    "nearest centroid (centroids = vec_id % 100 == 0, broadcast); "
    "reports cell populations. At scale this is the index build: search "
    "probes only the top cells (see operators in round 2); min/max per "
    "cell are aggregation-safe (no float summation).",
    tags=("similarity", "ann"),
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    # One narrow mapInPandas pass with the (tiny) centroid matrix in the
    # task closure — no crossJoin row explosion, no per-vector window;
    # the only shuffle is the final per-cell aggregation.
    assigned = ivf_assign(emb, centroids)
    return assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("cosine").alias("min_cos"),
        F.max("cosine").alias("max_cos"),
    )
