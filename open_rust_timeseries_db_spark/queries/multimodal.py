"""Multimodal / binary-payload queries (SURVEY.md §2.4, C2/E8-E9).

The reference's whole type system is "opaque little-endian bytes,
decoded by convention" (reference src/storage/table.rs:27, decode sites
src/tests/integration_test.rs:247-249). These queries keep that
capability as a first-class, oracle-checked surface:

- q_decode_roundtrip — encode typed fields to LE hex payloads and
  decode them back, all JVM-side (hex/substr/conv string ops compile to
  whole-stage codegen; no Python);
- q_binary_metadata — documents as opaque payloads + typed metadata
  (byte length vs char length, md5 fingerprint);
- q_frame_sample — Arrow-batched mapInPandas frame sampling (the
  image/video plumbing path, with a deterministic stand-in decoder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.operators.multimodal import frame_features
from open_rust_timeseries_db_spark.queries.helpers import events_us
from open_rust_timeseries_db_spark.queries.registry import query
from open_rust_timeseries_db_spark.sources.catalog import load_table

_WIDTH = 16  # hex chars in a u64 payload


def _le_hex_sql(expr: str) -> str:
    """DuckDB: big-endian hex of a BIGINT -> little-endian byte order."""
    be = f"lpad(to_hex({expr}), {_WIDTH}, '0')"
    pairs = ", ".join(
        f"substr({be}, {i}, 2)" for i in range(_WIDTH - 1, 0, -2)
    )
    return f"concat({pairs})"


def _rev_pairs_sql(expr: str) -> str:
    """DuckDB: reverse the byte (hex-pair) order of a 16-char hex string."""
    pairs = ", ".join(
        f"substr({expr}, {i}, 2)" for i in range(_WIDTH - 1, 0, -2)
    )
    return f"concat({pairs})"


def _le_hex(col: F.Column) -> F.Column:
    """Spark: BIGINT -> 16-char big-endian hex -> little-endian pairs."""
    be = F.lpad(F.hex(col), _WIDTH, "0")
    return F.concat(*[F.substring(be, i, 2) for i in range(_WIDTH - 1, 0, -2)])


def _le_decode(col: F.Column) -> F.Column:
    """Spark: little-endian 16-char hex payload -> BIGINT."""
    be = F.concat(*[F.substring(col, i, 2) for i in range(_WIDTH - 1, 0, -2)])
    return F.conv(be, 16, 10).cast("bigint")


@query(
    "q_decode_roundtrip",
    f"""
    SELECT event_id,
           {_le_hex_sql("user_id")} AS user_payload,
           {_le_hex_sql("CAST(FLOOR(value * 1e6) AS BIGINT)")} AS value_payload,
           CAST(CAST('0x' || {_rev_pairs_sql(_le_hex_sql("user_id"))} AS BIGINT)
                AS BIGINT) AS user_id_dec,
           CAST(FLOOR(value * 1e6) AS BIGINT) AS value_fx_dec
    FROM events WHERE event_id % 7 = 0
    """,
    doc="Binary encode/decode roundtrip: typed fields -> little-endian "
    "hex payloads -> decoded back, mirroring the reference's "
    "to_le_bytes/from_le_bytes convention (reference "
    "src/tests/integration_test.rs:164-173, 247-249). Pure string/conv "
    "expressions — whole-stage codegen, zero Python. The oracle "
    "independently re-derives both the payload bytes and the decoded "
    "values, so a broken encoder OR decoder hash-mismatches.",
    tags=("multimodal", "binary"),
)
def q_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir).filter(F.col("event_id") % 7 == 0)
    value_fx = F.floor(F.col("value") * 1e6).cast("bigint")
    enc = ev.select(
        "event_id",
        _le_hex(F.col("user_id")).alias("user_payload"),
        _le_hex(value_fx).alias("value_payload"),
    )
    # Decode from the payloads themselves (true roundtrip, not a copy of
    # the source columns).
    return enc.select(
        "event_id",
        "user_payload",
        "value_payload",
        _le_decode(F.col("user_payload")).alias("user_id_dec"),
        _le_decode(F.col("value_payload")).alias("value_fx_dec"),
    )


@query(
    "q_binary_metadata",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           CAST(length(text) AS BIGINT) AS char_len,
           md5(text) AS payload_md5,
           octet_length(encode(text)) > length(text) AS is_multibyte,
           source, lang
    FROM documents
    """,
    doc="Documents as opaque binary payloads with typed metadata: byte "
    "vs char length, md5 fingerprint, multibyte flag. The BinaryType "
    "column model for image/audio blobs (SURVEY.md §1.3) exercised on "
    "the table that exists in testdata; all JVM-side hash/length "
    "builtins.",
    tags=("multimodal", "binary"),
)
def q_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")  # the opaque-bytes column
    return docs.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("byte_len"),
        F.length("text").cast("bigint").alias("char_len"),
        F.md5(payload).alias("payload_md5"),
        (F.length(payload) > F.length("text")).alias("is_multibyte"),
        "source",
        "lang",
    )


@query(
    "q_frame_sample",
    """
    WITH f AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(CEIL(length(text) / 64.0) AS BIGINT)))
               AS frame_idx
      FROM documents
    )
    SELECT doc_id, frame_idx,
           md5(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)) AS frame_md5,
           CAST(length(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64))
                AS BIGINT) AS frame_len
    FROM f WHERE frame_idx % 3 = 0
    """,
    doc="Video-style frame sampling over opaque payloads via "
    "Arrow-batched mapInPandas (operators/multimodal.frame_features): "
    "64-char frames, every 3rd kept, deterministic md5 'feature' per "
    "frame. This is the real plumbing a codec stage uses — binary in, "
    "columnar Python batch, struct features out — with the decode "
    "stubbed deterministically (image libs absent by design).",
    tags=("multimodal", "pandas-udf"),
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return frame_features(docs, payload_col="text", id_col="doc_id")
