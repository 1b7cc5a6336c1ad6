"""Time-chunked table layout: partition pruning, ordered files, compaction.

The reference is a tick-ingest engine; at 100 TB the storage layout is
what makes its query half viable. Three facts drive this module:

1. **Almost every tick query carries a time predicate.** A layout that
   maps time ranges to directories (chunk partitioning) lets the scan
   skip whole directories at PLANNING time (partition pruning), and
   sorting rows by timestamp WITHIN each file gives tight per-row-group
   min/max stats so the parquet reader skips row groups at RUNTIME —
   the hypertable-chunk pattern re-expressed as vanilla Spark
   partitioned parquet (no table format required).

2. **Chunk layout is metadata, not convention.** The chunk width and
   timestamp column are recorded in a sidecar manifest at write time;
   readers derive the pruning predicate from the manifest instead of
   callers re-supplying (and mis-supplying) them.

3. **Streaming ingest produces small files forever.** Each micro-batch
   commit (streaming/run.foreach_batch_parquet) lands one file per
   state partition per trigger; a month of that is millions of tiny
   files and a scheduler-bound scan. Compaction is therefore a
   first-class maintenance operator, not an afterthought: rewrite each
   chunk's files into ~target-size, timestamp-sorted files, atomically
   per chunk, so readers never see a half-compacted chunk.

At cluster scale the same code runs with two changes the docstrings
note inline: the atomic directory swap becomes the table format's
commit (Iceberg/Delta snapshot), and chunks compact as independent
parallel jobs instead of a driver loop.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_time_layout.json"
_CHUNK_COL = "chunk_us"

DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


def write_time_layout(
    df: DataFrame,
    path: str,
    ts_col: str,
    chunk_us: int = DAY_US,
    n_range_partitions: int | None = None,
) -> None:
    """Write ``df`` as a time-chunked, timestamp-sorted parquet table.

    Rows land under ``path/chunk_us=<floor(ts/chunk)*chunk>/`` and are
    range-repartitioned + sorted by (chunk, ts) first, so each output
    file covers a tight, non-overlapping timestamp span — the property
    that makes parquet min/max row-group skipping effective. ``ts_col``
    must be an epoch-microsecond long (the engine's canonical encoding,
    queries/helpers.events_us).

    ``n_range_partitions`` bounds output parallelism (and, with
    chunking, the files-per-chunk); defaults to the session's shuffle
    partitioning. At 100 TB you size it as bytes / target-file-size
    exactly like shuffle partitions, and the range exchange samples
    keys, so skewed days spread across many partitions instead of one.
    """
    chunk = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(chunk_us))).cast("long")
    out = df.withColumn(_CHUNK_COL, chunk)
    n = n_range_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    (
        out.repartitionByRange(n, _CHUNK_COL, ts_col)
        .sortWithinPartitions(_CHUNK_COL, ts_col)
        .write.mode("overwrite")
        .partitionBy(_CHUNK_COL)
        .parquet(path)
    )
    manifest = {"ts_col": ts_col, "chunk_us": chunk_us, "version": 1}
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f)


# Session-memoized chunked copies of the events table, keyed like the
# other session artifacts (functions/text_kernels ckpt tables): the
# copy is written ONCE per (application, sf_dir) and every
# time-windowed consumer reads it pruned. In a deployment this is the
# table's PRIMARY layout written at ingest, not a per-session copy —
# the builder exists so the bench's cache-build phase charges the
# one-time write to its own line (queries/cache_builds.py).
_LAYOUT_MEMO: dict[tuple, str] = {}


def events_layout_ckpt(
    spark: SparkSession, sf_dir: str, chunk_us: int = DAY_US
) -> str:
    """Path of the session's time-chunked copy of ``events``.

    Carries the canonical tick projection (event_id, user_id, ts_us,
    value). Written to tmpfs when the host has one — same rationale as
    streaming/run's checkpoint placement: session-scoped artifact,
    never durable storage.
    """
    from open_rust_timeseries_db_spark.queries.helpers import events_us

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), chunk_us)
    path = _LAYOUT_MEMO.get(key)
    if path is None:
        base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
        path = os.path.join(base, f"spark-graft-layout-{uuid.uuid4().hex[:10]}")
        ev = events_us(spark, sf_dir).select(
            "event_id", "user_id", "ts_us", "value"
        )
        write_time_layout(ev, path, ts_col="ts_us", chunk_us=chunk_us)
        _LAYOUT_MEMO[key] = path
    return path


def zorder_key(
    cols: list, bounds: list[tuple[float, float]], bits: int = 16
):
    """Morton (Z-order) key over normalized columns — bit-interleaved.

    Each column is scaled to a ``bits``-bit integer over its [lo, hi]
    bounds (monotone double arithmetic, same contract as
    operators/percentiles.selection_bin: consistency and monotonicity
    are all ordering needs, exact values never flow through the key),
    then the quantized coordinates interleave bit-by-bit: sorting by
    the result clusters rows that are close in EVERY dimension, so
    per-file min/max stats become selective for predicates on any of
    the columns — Delta/Iceberg's OPTIMIZE ZORDER, as plain Spark
    expressions. 2 dims x 16 bits = a 32-bit key; whole-stage codegen
    folds the ~64 shift/mask terms into straight-line JVM code.
    """
    from pyspark.sql import functions as F

    quantized = []
    top = (1 << bits) - 1
    for c, (lo, hi) in zip(cols, bounds):
        span = float(hi) - float(lo)
        if span <= 0:
            quantized.append(F.lit(0).cast("long"))
            continue
        q = F.floor(
            (c.cast("double") - F.lit(float(lo)))
            / F.lit(span)
            * F.lit(float(top))
        ).cast("long")
        quantized.append(
            F.least(F.greatest(q, F.lit(0)), F.lit(top))
        )
    ndim = len(quantized)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for d, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ndim + d))
    return z


def write_zorder_layout(
    df: DataFrame,
    path: str,
    ts_col: str,
    key_col: str,
    chunk_us: int = DAY_US,
    bits: int = 16,
    n_range_partitions: int | None = None,
) -> None:
    """Write ``df`` time-chunked with Z-ORDERED files inside each chunk.

    Same directory scheme as :func:`write_time_layout` (``chunk_us=``
    partitions, manifest sidecar, interval reads via
    :func:`read_time_range` unchanged), but files within a chunk are
    range-split and sorted by the Morton key over (ts_col, key_col)
    instead of by timestamp alone. Trade: a pure time window prunes
    slightly less tightly inside a chunk (directory pruning is
    untouched), while 2-D predicates — the symbol + time-window shape
    that dominates tick workloads — prune files on BOTH columns
    (tests/test_layout.py measures the file-stat overlap both ways).

    The column bounds feed the key's quantization; they are computed
    in one aggregation at write time (this is an ingest-time job) and
    recorded in the manifest so appends/compaction can reuse the same
    quantization grid.
    """
    from pyspark.sql import functions as F

    lo_ts, hi_ts, lo_k, hi_k = df.agg(
        F.min(ts_col), F.max(ts_col), F.min(key_col), F.max(key_col)
    ).first()
    if lo_ts is None:
        # Empty input (or all-null ts): no bounds to quantize against.
        # Fail loudly — an empty layout write is almost always a bug in
        # the caller's filter, and zorder_key would otherwise crash on
        # float(None) with a baffling TypeError.
        raise ValueError(
            f"write_zorder_layout: input has no non-null {ts_col!r} rows; "
            "refusing to write an empty layout"
        )
    bounds = [(lo_ts, hi_ts), (lo_k, hi_k)]
    chunk = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(chunk_us))).cast(
        "long"
    )
    z = zorder_key([F.col(ts_col), F.col(key_col)], bounds, bits)
    out = df.withColumn(_CHUNK_COL, chunk).withColumn("__z", z)
    n = n_range_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    (
        out.repartitionByRange(n, _CHUNK_COL, "__z")
        .sortWithinPartitions(_CHUNK_COL, "__z")
        .drop("__z")
        .write.mode("overwrite")
        .partitionBy(_CHUNK_COL)
        .parquet(path)
    )
    manifest = {
        "ts_col": ts_col,
        "chunk_us": chunk_us,
        "order": {
            "type": "zorder",
            "cols": [ts_col, key_col],
            "bits": bits,
            "bounds": [[lo_ts, hi_ts], [lo_k, hi_k]],
        },
        "version": 2,
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f)


def events_zorder_ckpt(
    spark: SparkSession, sf_dir: str, chunk_us: int = DAY_US
) -> str:
    """Path of the session's Z-ORDERED chunked copy of ``events``
    (interleaved ts_us x user_id) — the layout the symbol+time 2-D
    scan (q_zorder_scan) reads. Memoized like events_layout_ckpt."""
    from open_rust_timeseries_db_spark.queries.helpers import events_us

    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        chunk_us,
        "zorder",
    )
    path = _LAYOUT_MEMO.get(key)
    if path is None:
        base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
        path = os.path.join(base, f"spark-graft-zorder-{uuid.uuid4().hex[:10]}")
        ev = events_us(spark, sf_dir).select(
            "event_id", "user_id", "ts_us", "value"
        )
        write_zorder_layout(
            ev, path, ts_col="ts_us", key_col="user_id", chunk_us=chunk_us
        )
        _LAYOUT_MEMO[key] = path
    return path


def events_append_layout_ckpt(
    spark: SparkSession, sf_dir: str, chunk_us: int = DAY_US
) -> str:
    """Path of a chunked events copy built by APPENDS + COMPACTION —
    the ingest lifecycle, not a one-shot write.

    Three interleaved slices (event_id mod 3, so every append lands
    files into EXISTING chunk directories — the stressing case) go in
    as write + two appends, then :func:`compact_chunks` folds each
    chunk's accumulated files back into sorted target-size files. The
    oracle-checked q_append_window_scan reads this layout, proving the
    whole cycle lossless. Memoized like events_layout_ckpt.
    """
    from open_rust_timeseries_db_spark.queries.helpers import events_us

    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        chunk_us,
        "append",
    )
    path = _LAYOUT_MEMO.get(key)
    if path is None:
        base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
        path = os.path.join(
            base, f"spark-graft-append-{uuid.uuid4().hex[:10]}"
        )
        ev = events_us(spark, sf_dir).select(
            "event_id", "user_id", "ts_us", "value"
        )
        write_time_layout(
            ev.filter(F.col("event_id") % 3 == 0),
            path,
            ts_col="ts_us",
            chunk_us=chunk_us,
        )
        for r in (1, 2):
            append_time_layout(ev.filter(F.col("event_id") % 3 == r), path)
        compact_chunks(path=path, spark=spark, target_file_bytes=8 << 20)
        _LAYOUT_MEMO[key] = path
    return path


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, _MANIFEST)) as f:
        return json.load(f)


def append_time_layout(
    df: DataFrame,
    path: str,
    n_range_partitions: int | None = None,
    ingest_id: int | None = None,
) -> None:
    """Append rows into an EXISTING layout, reusing its manifest.

    The write derives everything from the manifest the original write
    recorded: the chunk width and timestamp column always, and — for
    Z-ordered layouts — the quantization bounds, so appended files sort
    on the SAME Morton grid as the originals (rows outside the original
    bounds clamp to the grid edge: still monotone, still prunable,
    exactly the contract zorder_key documents). New chunk directories
    appear as needed; existing chunks gain files, which is what
    :func:`compact_chunks` exists to fold back in.

    ``ingest_id`` (streaming): when given, the batch stages to a
    scratch directory and its files MOVE into the chunk directories
    under deterministic ``ingest-<id>-*.parquet`` names, after first
    deleting any files of that prefix — a micro-batch REPLAYED after a
    crash (same batch id) replaces its own (possibly partial) prior
    output instead of appending a second copy, the same
    exactly-once-per-batch-id contract as
    streaming/run.write_batch_idempotent. Spark's partition discovery
    requires every data file at the same leaf depth, so the batch id
    lives in FILE NAMES, not a partition level; the rename-based
    commit is the local-FS stand-in for a table format's snapshot
    (same seam as compact_chunks' atomic swap). The batch stages to
    scratch FIRST and swaps per chunk only after the full write
    succeeds, so a crash mid-replay never loses the previously
    committed copy. ``ingest_id`` MUST be the stream's monotonic
    batch id and never reused with different rows — a replayed id is
    assumed to carry identical data; reuse with different data
    converges to replace-semantics (the prior payload is dropped),
    not a union. Batch appends (``None``) write plain files straight
    into the chunk directories.
    """
    man = read_manifest(path)
    ts_col, chunk_us = man["ts_col"], man["chunk_us"]
    chunk = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(chunk_us))).cast(
        "long"
    )
    order = man.get("order")
    out = df.withColumn(_CHUNK_COL, chunk)
    n = n_range_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    if order and order.get("type") == "zorder":
        cols = [F.col(c) for c in order["cols"]]
        bounds = [tuple(b) for b in order["bounds"]]
        out = out.withColumn(
            "__z", zorder_key(cols, bounds, order["bits"])
        )
        sort_cols = [_CHUNK_COL, "__z"]
    else:
        sort_cols = [_CHUNK_COL, ts_col]
    out = out.repartitionByRange(n, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
    if "__z" in out.columns:
        out = out.drop("__z")
    if ingest_id is None:
        out.write.mode("append").partitionBy(_CHUNK_COL).parquet(path)
        return
    prefix = f"ingest-{int(ingest_id)}-"
    # STAGE FIRST, swap after: the scratch write must fully succeed
    # before any prior file of this batch id is touched — a crash
    # mid-staging leaves the previously committed batch intact (the
    # old order deleted first, so a crash between delete and rename
    # lost the batch entirely). Same stage-then-swap discipline as
    # compact_chunks.
    scratch = os.path.join(path, f".ingest-{uuid.uuid4().hex[:8]}")
    out.write.mode("overwrite").partitionBy(_CHUNK_COL).parquet(scratch)
    try:
        staged: dict[str, list[str]] = {}
        for entry in os.listdir(scratch):
            if entry.startswith(f"{_CHUNK_COL}="):
                staged[entry] = sorted(
                    f
                    for f in os.listdir(os.path.join(scratch, entry))
                    if f.endswith(".parquet") and not f.startswith((".", "_"))
                )
        # Per chunk: delete THAT chunk's prior prefix files, then move
        # the staged replacements in. The unprotected window is one
        # chunk wide (a concurrent reader can see one chunk's slice of
        # the batch missing mid-swap) — the documented local-FS seam; a
        # table format's snapshot commit closes it at cluster scale.
        for entry, files in staged.items():
            src_dir = os.path.join(scratch, entry)
            dst_dir = os.path.join(path, entry)
            os.makedirs(dst_dir, exist_ok=True)
            for fname in os.listdir(dst_dir):
                if fname.startswith(prefix):
                    os.remove(os.path.join(dst_dir, fname))
            for seq, fname in enumerate(files):
                os.rename(
                    os.path.join(src_dir, fname),
                    os.path.join(dst_dir, f"{prefix}{seq}.parquet"),
                )
        # Prior files of this batch id in chunks the replay did NOT
        # produce can only exist if an ingest_id was REUSED with
        # different rows — forbidden by the contract (ingest_id is the
        # stream's monotonic batch id; a replay carries identical
        # data). Sweep them anyway so a contract violation converges
        # to replace-semantics instead of leaving orphans.
        for entry in os.listdir(path):
            if not entry.startswith(f"{_CHUNK_COL}=") or entry in staged:
                continue
            full = os.path.join(path, entry)
            for fname in os.listdir(full):
                if fname.startswith(prefix):
                    os.remove(os.path.join(full, fname))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def stream_into_time_layout(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    n_range_partitions: int | None = None,
):
    """Streaming ingest into a chunked layout: each micro-batch appends
    via :func:`append_time_layout` keyed on its batch id (replay-safe),
    landing time-chunked and grid-sorted from the first file. The
    compaction cycle (:func:`compact_chunks`) folds the per-trigger
    small files into target-size sorted files chunk-atomically — the
    ingest composition a tick archive actually runs. Returns the
    started StreamingQuery.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        append_time_layout(
            batch_df, path, n_range_partitions, ingest_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_time_range(
    spark: SparkSession,
    path: str,
    lo_us: int | None = None,
    hi_us: int | None = None,
) -> DataFrame:
    """Scan a time-chunked table for ``lo_us <= ts < hi_us``.

    Two pruning tiers, both derived from the manifest so callers state
    only the interval:

    - a predicate on the CHUNK partition column — Catalyst prunes
      non-overlapping ``chunk_us=`` directories at planning time
      (PartitionFilters in the scan node), so the file listing itself
      shrinks: the property that keeps a 10-year tick archive queryable
      for a one-day window;
    - the row-level ``ts`` predicate — pushed to the parquet reader
      (PushedFilters), skipping row groups via min/max, which the
      sorted write above made tight.

    Returns the full row set of the interval with the chunk column
    dropped (layout detail, not data).
    """
    man = read_manifest(path)
    ts_col, chunk_us = man["ts_col"], man["chunk_us"]
    df = spark.read.parquet(path)
    if lo_us is not None:
        df = df.filter(
            (F.col(_CHUNK_COL) >= (lo_us // chunk_us) * chunk_us)
            & (F.col(ts_col) >= lo_us)
        )
    if hi_us is not None:
        df = df.filter(
            (F.col(_CHUNK_COL) <= ((hi_us - 1) // chunk_us) * chunk_us)
            & (F.col(ts_col) < hi_us)
        )
    return df.drop(_CHUNK_COL)


def chunk_file_stats(path: str) -> dict[str, dict]:
    """Per-chunk file census: {chunk_dir: {n_files, bytes}}.

    Driver-side directory listing — at cluster scale this is a
    metastore/manifest query, but the quantity measured (files per
    chunk, bytes per file) is the same one compaction triggers on.
    """
    stats: dict[str, dict] = {}
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(f"{_CHUNK_COL}="):
            continue
        full = os.path.join(path, entry)
        files = [
            os.path.join(full, f)
            for f in os.listdir(full)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        stats[entry] = {
            "n_files": len(files),
            "bytes": sum(os.path.getsize(f) for f in files),
        }
    return stats


def drop_chunks_before(path: str, cutoff_us: int) -> list[str]:
    """Retention: delete every chunk strictly OLDER than ``cutoff_us``.

    A chunk directory covers [chunk, chunk + chunk_us); it is dropped
    only when that whole interval precedes the cutoff — rows at or
    past the cutoff are never touched, so retention is always
    conservative (a partially-expired chunk survives until its last
    row ages out). This is the hypertable `drop_chunks` pattern: data
    expiry as O(#chunks) directory deletes, never a rewrite — the only
    affordable way to expire data from a 100 TB archive. The manifest
    is untouched (layout geometry survives an empty table). Returns
    the chunk dirs removed.
    """
    man = read_manifest(path)
    chunk_us = man["chunk_us"]
    dropped: list[str] = []
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(f"{_CHUNK_COL}="):
            continue
        chunk_lo = int(entry.split("=", 1)[1])
        if chunk_lo + chunk_us <= cutoff_us:
            shutil.rmtree(os.path.join(path, entry))
            dropped.append(entry)
    return dropped


def compact_chunks(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    min_files_to_compact: int = 2,
) -> dict[str, tuple[int, int]]:
    """Rewrite each chunk's small files into ~target-size sorted files.

    For every chunk directory holding ``min_files_to_compact`` or more
    files AND averaging under the target size, read the chunk, re-sort
    by the manifest timestamp (restoring the ordered-file property that
    interleaved streaming commits destroyed), and write
    ``ceil(bytes / target)`` files. The rewrite goes to a scratch
    directory first and replaces the chunk with two ``os.rename`` calls
    — readers race against an atomic swap, never a partial directory.
    At cluster scale this per-chunk commit is exactly what a table
    format's snapshot swap provides; chunks are independent, so a real
    deployment fans the loop out as one job per chunk.

    Returns {chunk_dir: (files_before, files_after)} for the chunks
    rewritten.

    Chunks are independent, so their rewrite jobs run CONCURRENTLY from
    a small driver thread pool (guide-standard overlap of independent
    jobs): each chunk is still its own read → range-sort → write →
    atomic swap, but the next chunk's tasks back-fill executors freed
    by the current chunk's tail instead of waiting out a full
    job-per-chunk serial loop (measured on the 30-chunk sf0.1 append
    layout: 19-21 s serial → ~4 s at 8 in flight; per-chunk results and
    the swap protocol are unchanged). At cluster scale this is exactly
    the "one job per chunk, fanned out" deployment the serial loop was
    documented as standing in for.
    """
    man = read_manifest(path)
    ts_col = man["ts_col"]
    order = man.get("order")

    def compact_one(entry: str, st: dict) -> tuple[str, tuple[int, int]]:
        full = os.path.join(path, entry)
        n_out = max(1, math.ceil(st["bytes"] / target_file_bytes))
        scratch = os.path.join(path, f".compact-{uuid.uuid4().hex[:8]}")
        chunk_df = spark.read.parquet(full)
        if order and order.get("type") == "zorder":
            # Restore the manifest's Morton clustering, not plain ts
            # order — compaction must preserve the layout's 2-D
            # pruning contract, reusing the recorded grid.
            zk = zorder_key(
                [F.col(c) for c in order["cols"]],
                [tuple(b) for b in order["bounds"]],
                order["bits"],
            )
            sorted_df = (
                chunk_df.withColumn("__z", zk)
                .repartitionByRange(n_out, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        else:
            sorted_df = chunk_df.repartitionByRange(
                n_out, ts_col
            ).sortWithinPartitions(ts_col)
        sorted_df.write.mode("overwrite").parquet(scratch)
        # Drop the batch writer's _SUCCESS marker so the swapped-in
        # directory holds only data files like the original chunk.
        marker = os.path.join(scratch, "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)
        trash = os.path.join(path, f".trash-{uuid.uuid4().hex[:8]}")
        os.rename(full, trash)
        os.rename(scratch, full)
        shutil.rmtree(trash, ignore_errors=True)
        return entry, (st["n_files"], len(os.listdir(full)))

    todo = [
        (entry, st)
        for entry, st in chunk_file_stats(path).items()
        if st["n_files"] >= min_files_to_compact
        and st["bytes"] / st["n_files"] < target_file_bytes
    ]
    if not todo:
        return {}
    done: dict[str, tuple[int, int]] = {}
    if len(todo) == 1:
        entry, result = compact_one(*todo[0])
        return {entry: result}
    # FIFO scheduling back-fills naturally; 8 in flight is enough to
    # hide each job's scheduling floor without thrashing the scheduler.
    # Futures are drained individually (not pool.map) so one failed
    # chunk doesn't discard the results of chunks whose atomic swaps
    # already completed: the caller learns exactly which chunks were
    # rewritten via the exception's .partial attribute.
    from concurrent.futures import ThreadPoolExecutor, as_completed

    failures: list[BaseException] = []
    with ThreadPoolExecutor(max_workers=min(8, len(todo))) as pool:
        futures = [pool.submit(compact_one, *args) for args in todo]
        for fut in as_completed(futures):
            try:
                entry, result = fut.result()
            except BaseException as exc:  # noqa: BLE001 - re-raised below
                failures.append(exc)
            else:
                done[entry] = result
    if failures:
        err = failures[0]
        err.partial = dict(done)  # type: ignore[attr-defined]
        raise err
    return done
