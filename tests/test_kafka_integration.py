"""Kafka ingest-path integration test (gated by broker availability).

Mirrors the reference's MPMC produce/consume topology
(src/tests/integration_test.rs:148-232: 4 producers x 10k ticks through
a bounded ring, 3 consumers, zero loss/duplication) on the production
transport: N producer partitions -> one topic -> a bounded-intake
Structured Streaming drain (maxOffsetsPerTrigger = the ring capacity)
with exactly-once accounting.

Gating: requires (a) a reachable broker — env ``KAFKA_BOOTSTRAP`` or
localhost:9092 — and (b) the spark-sql-kafka connector on the
classpath. Neither ships in this container, so the test SKIPS here
with the precise reason; on a cluster with both it moves real bytes
through Kafka. The broker-free mapping (ring capacity ->
maxOffsetsPerTrigger, JSON payload -> typed columns) stays covered
unconditionally by tests/test_streaming.py.
"""

from __future__ import annotations

import json
import os
import socket
import uuid

import pytest


def _broker() -> str | None:
    cand = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")
    host, _, port = cand.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=1):
            return cand
    except OSError:
        return None


def _has_kafka_connector(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def test_kafka_produce_consume_exactly_once(spark):
    broker = _broker()
    if broker is None:
        pytest.skip("no Kafka broker reachable (set KAFKA_BOOTSTRAP)")
    if not _has_kafka_connector(spark):
        pytest.skip("spark-sql-kafka connector not on the classpath")

    from pyspark.sql import functions as F

    from open_rust_timeseries_db_spark.streaming.run import (
        run_available_now_to_memory,
    )
    from open_rust_timeseries_db_spark.streaming.sources import (
        MARKET_TICK_SCHEMA,
        kafka_market_stream,
    )

    topic = f"orts-test-{uuid.uuid4().hex[:8]}"
    n_producers, n_per = 4, 10_000  # reference topology

    # Produce: one batch write per "producer" (distinct exchange_id),
    # keyed by symbol so per-key ordering survives partitioning.
    rows = [
        (
            json.dumps(
                {
                    "symbol_id": 100 + p,
                    "price": 1000.0 + i * 0.01,
                    "quantity": 100 + i % 100,
                    "ts": 1_700_000_000_000_000_000 + i,
                    "exchange_id": p,
                }
            ),
            str(100 + p),
        )
        for p in range(n_producers)
        for i in range(n_per)
    ]
    (
        spark.createDataFrame(rows, "value string, key string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("topic", topic)
        .save()
    )

    # Consume: bounded-intake drain from the beginning; availableNow
    # processes the whole topic in ring-capacity micro-batches.
    stream = kafka_market_stream(
        spark, broker, topic, starting_offsets="earliest"
    )
    agg = stream.groupBy("exchange_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("quantity").alias("qty_sum"),
    )
    result = run_available_now_to_memory(spark, agg, mode="complete")
    got = {r["exchange_id"]: (r["n"], r["qty_sum"]) for r in result.collect()}

    expected_qty = sum(100 + i % 100 for i in range(n_per))
    assert len(got) == n_producers
    for p in range(n_producers):
        # Exactly-once: every produced record counted once, none torn.
        assert got[p] == (n_per, expected_qty)
