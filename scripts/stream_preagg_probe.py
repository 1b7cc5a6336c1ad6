"""Round-8 probe: can a pre-aggregation ahead of the stateful operator
shave q_stream_ohlc's ~1.1-1.9 s drain?

Three measurements at $1 (default /root/testdata/sf0.1), written to
STREAM_PREAGG_PROBE.json:

1. plan evidence — the baseline stateful drain's executed plan ALREADY
   contains a partial HashAggregate upstream of the shuffle and state
   store: Structured Streaming aggregation is partial -> exchange ->
   StateStoreRestore -> merge -> StateStoreSave, so a hand-rolled
   per-batch "hour-bucket pre-agg" would collapse exactly the rows the
   partial phase already collapses (and the state row count — one per
   (user, minute) group, ~100k at sf0.1 — is fixed by the OUTPUT key,
   which no input-side pre-agg can reduce).
2. baseline wall — windowed_ohlc drained availableNow, state_partitions
   = 16, warm min of 3 (exactly q_stream_ohlc's shape).
3. foreachBatch batch-agg wall — the one architecture that does remove
   the cost: for a single-batch availableNow drain the batch aggregate
   is semantically identical and pays a plain hash agg instead of 100k
   state-store writes + per-partition commits. Kept as a PROBE, not the
   registered query: q_stream_ohlc exists to exercise (and gate) the
   real stateful merge path that an unbounded multi-batch stream needs.

Usage: python scripts/stream_preagg_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open_rust_timeseries_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import bench
    from open_rust_timeseries_db_spark.queries import all_queries
    from open_rust_timeseries_db_spark.streaming.pipelines import (
        windowed_ohlc,
    )
    from open_rust_timeseries_db_spark.streaming.run import (
        run_available_now_to_memory,
    )
    from open_rust_timeseries_db_spark.streaming.sources import (
        events_file_stream,
    )

    spark = get_spark("stream-preagg-probe", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    bench.warmup_session(spark, sf_dir)
    specs = all_queries()

    # 1. Plan evidence: partial agg above the state store.
    q = (
        windowed_ohlc(events_file_stream(spark, sf_dir))
        .writeStream.format("noop")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # The executed plan of the last micro-batch (q.explain prints it).
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain()
    last_plan = buf.getvalue()
    q.stop()
    has_partial_below_state = bool(
        re.search(
            r"StateStoreRestore[\s\S]*HashAggregate", last_plan
        )
    )

    # 2. Baseline stateful drain (q_stream_ohlc's exact shape).
    def drain_stateful() -> float:
        t0 = time.perf_counter()
        specs["q_stream_ohlc"].fn(spark, sf_dir).count()
        return time.perf_counter() - t0

    baseline = [round(drain_stateful(), 4) for _ in range(3)]

    # 3. foreachBatch batch-agg variant: same output, no state store.
    from pyspark.sql import functions as F

    result_rows: list[int] = []

    def batch_agg(df, _bid) -> None:
        agg = (
            df.withColumn(
                "_ord", F.col("ts_us") * 1000 + F.col("event_id") % 1000
            )
            .groupBy(
                "user_id", F.window(F.col("ts_ts"), "1 minute").alias("win")
            )
            .agg(
                F.min_by("value", "_ord").alias("open_v"),
                F.max("value").alias("high_v"),
                F.min("value").alias("low_v"),
                F.max_by("value", "_ord").alias("close_v"),
                F.count(F.lit(1)).alias("n_ticks"),
            )
        )
        result_rows.append(agg.count())

    def drain_foreach_batch() -> float:
        result_rows.clear()
        t0 = time.perf_counter()
        fq = (
            events_file_stream(spark, sf_dir)
            .writeStream.foreachBatch(batch_agg)
            .trigger(availableNow=True)
            .start()
        )
        fq.awaitTermination(300)
        fq.stop()
        return time.perf_counter() - t0

    foreach_b = [round(drain_foreach_batch(), 4) for _ in range(3)]

    out = {
        "sf_dir": sf_dir,
        "verdict": (
            "NO win available from an input-side pre-agg: the streaming "
            "aggregate plan already runs a partial HashAggregate before "
            "the shuffle and state store (see "
            "partial_agg_already_below_state_store), and state volume is "
            "fixed by the output key (one row per user x minute). The "
            "only faster architecture is skipping the state store "
            "entirely (foreachBatch batch agg) — measured below — which "
            "trades away the multi-batch merge semantics the registered "
            "query exists to exercise."
        ),
        "partial_agg_already_below_state_store": has_partial_below_state,
        "stateful_drain_sec": baseline,
        "foreach_batch_agg_sec": foreach_b,
        "foreach_batch_rows": result_rows,
    }
    path = Path(__file__).resolve().parent.parent / "STREAM_PREAGG_PROBE.json"
    path.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
