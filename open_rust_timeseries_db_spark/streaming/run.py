"""Streaming execution helpers: sinks and bounded-drain runners.

The reference's consumers run until a message quota is hit
(src/tests/integration_test.rs:219-221); the verifiable analog here is
``availableNow`` — drain everything the source currently has, commit,
stop. Sinks:

- memory sink (:func:`run_available_now_to_memory`) for tests/oracles;
- parquet-per-batch (:func:`foreach_batch_parquet`) as the durable
  sink: each micro-batch commits atomically, upgrading the reference's
  torn-write hazard (src/storage/table.rs:61-76 can fail halfway) to
  per-batch exactly-once.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

# Bounded verification drains put their checkpoint (offset/commit logs
# + state files, several fsyncs per micro-batch) on tmpfs when the host
# has one: measured ~25% off q_stream_ohlc wall time. Semantically safe
# HERE ONLY because the memory sink is already ephemeral — the drain is
# a one-shot verification, not a resumable pipeline. A durable pipeline
# (foreach_batch_parquet) must checkpoint to durable storage; never
# copy this into one.
_SHM_CKPT_ROOT = "/dev/shm/spark-graft-ckpt"

# Diagnostic: the last bounded drain's per-batch durationMs maps
# (addBatch / queryPlanning / walCommit / ...), captured before the
# query object goes away — scripts/floor_decomposition.py reads this
# to attribute streaming wall time to machinery vs data work.
LAST_DRAIN_PROGRESS: list[dict] = []


def run_available_now_to_memory(
    spark: SparkSession,
    stream: DataFrame,
    mode: str = "complete",
    timeout_s: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain the stream with availableNow into a memory sink; return the
    result as a batch DataFrame.

    The memory sink is driver-local — strictly a test/verification
    sink (bounded output only: aggregates or small key sets). Durable
    pipelines use :func:`foreach_batch_parquet`.

    ``state_partitions`` sizes the stateful-operator partitioning.
    Unlike batch shuffles, streaming state partitions are NOT
    AQE-coalesced and are frozen into the checkpoint at first start, so
    they must be provisioned to expected STATE volume explicitly: each
    partition costs one state-store commit (file create + fsync) per
    micro-batch, so overshooting pure overhead. The batch-session
    default (sized for sf0.1 data shuffles) is ~10x too many for these
    bounded windowed aggregates; a real deployment sizes this to
    state-bytes / executor-memory-budget and scales it by re-keying the
    checkpoint, not by AQE.
    """
    name = f"mem_{uuid.uuid4().hex[:12]}"
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    ckpt_dir = None
    if os.path.isdir("/dev/shm"):
        ckpt_dir = os.path.join(_SHM_CKPT_ROOT, name)
    if state_partitions is not None:
        # Captured at .start() when the stateful plan is bound; restored
        # immediately after so batch queries are unaffected.
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        writer = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
        )
        if ckpt_dir is not None:
            writer = writer.option("checkpointLocation", ckpt_dir)
        q = writer.start()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    try:
        q.awaitTermination(timeout_s)
    finally:
        try:
            LAST_DRAIN_PROGRESS[:] = [
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": p.get("durationMs") or {},
                }
                for p in (q.recentProgress or [])
            ]
        except Exception:  # pragma: no cover - diagnostics only
            pass
        if q.isActive:
            q.stop()
        if ckpt_dir is not None:
            shutil.rmtree(ckpt_dir, ignore_errors=True)
        # Unload this drain's state-store providers NOW instead of
        # waiting for the maintenance thread (60 s default): each
        # provider keeps its full loaded key map on-heap after the
        # query stops, so a sweep of bounded drains accumulates every
        # drain's state (~1M entries per per-user drain at sf1) until
        # maintenance runs — measured as 8 s -> 89 s blow-ups on later
        # drains in one session, collapsing to a stable 8.7-9.7 s with
        # the explicit unload. StateStore.stop() is the test-suite
        # unload hook; providers lazily re-register (and the
        # maintenance task restarts) on the next stateful query, and a
        # concurrent live query would reload from its checkpoint — the
        # normal recovery path. Best-effort: a private JVM surface, so
        # any signature drift degrades to the maintenance-thread
        # behavior rather than failing the drain.
        try:
            jvm = spark._jvm
            jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        except Exception:  # pragma: no cover - depends on Spark internals
            pass
    # The memory sink pins its rows on the DRIVER for as long as its
    # temp view stays registered — across a 101-query bench sweep the
    # per-user drains (session/OHLC, ~1M rows each at sf1, two passes
    # apiece) would accumulate unbounded driver heap and GC pressure.
    # Re-home the result into block-manager storage (spillable,
    # ContextCleaner-collected once the caller drops its reference)
    # and drop the sink view: the drain leaves no session residue.
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def foreach_batch_parquet(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
):
    """Durable sink: write each micro-batch to a parquet dataset,
    idempotently per batch id.

    ``foreachBatch`` alone is at-least-once: after a crash, Structured
    Streaming replays the last uncommitted micro-batch with the SAME
    batch_id, so a plain append would duplicate its rows. We make the
    replay idempotent by keying the write on the batch id: each batch
    lands in ``out_dir/batch_id=<id>/`` with mode("overwrite"), so a
    replayed batch overwrites its own partial output instead of
    appending a second copy. Readers see the union via partition
    discovery on ``batch_id`` (read out_dir as usual; the extra column
    is droppable). Returns the started StreamingQuery.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_idempotent(batch_df, batch_id, out_dir, partition_by)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def write_batch_idempotent(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    partition_by: list[str] | None = None,
) -> None:
    """Write one micro-batch into ``out_dir/batch_id=<id>/``, replay-safe.

    Overwrite-into-own-directory = exactly-once per batch id: a replayed
    batch overwrites its own (possibly partial) prior output instead of
    appending a second copy; the batch writer's commit protocol makes
    each directory's contents atomic (_SUCCESS-gated).
    """
    writer = batch_df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(f"{out_dir}/batch_id={batch_id}")
