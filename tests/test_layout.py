"""Time-chunked layout: pruning is PROVEN, compaction is atomic + lossless.

Every assertion here is about physical behavior, not intent: partition
pruning is checked by counting the files a filtered scan actually
touches (input_file_name at execution time) AND by the scan node's
PartitionFilters; compaction is checked for file-count reduction,
orderless content parity, and restored within-file timestamp order.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.queries.helpers import events_us
from open_rust_timeseries_db_spark.sources.layout import (
    DAY_US,
    chunk_file_stats,
    compact_chunks,
    read_manifest,
    read_time_range,
    write_time_layout,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def layout_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "events_chunked")
    ev = events_us(spark, SF_DIR).select("event_id", "user_id", "ts_us", "value")
    write_time_layout(ev, path, ts_col="ts_us", chunk_us=DAY_US)
    return path


def _touched_files(df) -> set[str]:
    return {
        r[0]
        for r in df.select(F.input_file_name()).distinct().collect()
    }


def test_manifest_records_layout(layout_path):
    man = read_manifest(layout_path)
    assert man["ts_col"] == "ts_us"
    assert man["chunk_us"] == DAY_US


def test_time_range_prunes_files_and_matches_full_scan(spark, layout_path):
    ev = events_us(spark, SF_DIR)
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).first()
    assert hi - lo > 4 * DAY_US, "testdata must span several chunks"
    q_lo = lo + DAY_US
    q_hi = q_lo + DAY_US  # a one-chunk window inside the span

    pruned = read_time_range(spark, layout_path, q_lo, q_hi)
    full = spark.read.parquet(layout_path)

    # Execution-time proof: the filtered scan touches a strict subset
    # of the table's files (directory pruning really happened).
    touched = _touched_files(pruned)
    all_files = _touched_files(full)
    assert touched and touched < all_files

    # Planning-time proof: the chunk predicate landed in the scan's
    # PartitionFilters (pruned at listing, not post-scan).
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "chunk_us" in plan

    # And the pruned read is lossless for the interval.
    expect = sorted(
        full.filter((F.col("ts_us") >= q_lo) & (F.col("ts_us") < q_hi))
        .select("event_id")
        .toPandas()["event_id"]
        .tolist()
    )
    got = sorted(pruned.select("event_id").toPandas()["event_id"].tolist())
    assert got == expect and len(got) > 0


def test_open_interval_reads_everything(spark, layout_path):
    ev = events_us(spark, SF_DIR)
    assert read_time_range(spark, layout_path).count() == ev.count()


def test_files_are_timestamp_sorted(spark, layout_path):
    # Within every file the ts column is non-decreasing — the property
    # that makes parquet min/max row-group skipping tight.
    df = spark.read.parquet(layout_path).withColumn(
        "f", F.input_file_name()
    )
    inversions = (
        df.withColumn(
            "prev",
            F.lag("ts_us").over(
                Window.partitionBy("f").orderBy(F.monotonically_increasing_id())
            ),
        )
        .filter(F.col("ts_us") < F.col("prev"))
        .count()
    )
    assert inversions == 0


class TestCompaction:
    @pytest.fixture(scope="class")
    def fragmented(self, spark, tmp_path_factory):
        """A chunked table whose chunks hold many tiny files — the
        shape streaming ingest produces (one file per state partition
        per micro-batch commit)."""
        path = str(tmp_path_factory.mktemp("compact") / "events_small_files")
        ev = events_us(spark, SF_DIR).select("event_id", "user_id", "ts_us", "value")
        # Round-robin repartition BEFORE the layout write is defeated
        # by write_time_layout's own range exchange, so fragment the
        # chunks directly: write the layout, then explode each chunk
        # into shuffled small files (interleaved commits).
        write_time_layout(ev, path, ts_col="ts_us", chunk_us=DAY_US)
        for entry in os.listdir(path):
            if not entry.startswith("chunk_us="):
                continue
            full = os.path.join(path, entry)
            part = spark.read.parquet(full).repartition(4)
            part.write.mode("overwrite").parquet(full + ".tmp")
            import shutil

            shutil.rmtree(full)
            os.rename(full + ".tmp", full)
        return path

    def test_compaction_reduces_files_atomically_and_losslessly(
        self, spark, fragmented
    ):
        before_rows = sorted(
            spark.read.parquet(fragmented).select("event_id").toPandas()["event_id"]
        )
        before = chunk_file_stats(fragmented)
        assert sum(st["n_files"] for st in before.values()) > len(before), (
            "fragmentation fixture produced no multi-file chunks"
        )

        done = compact_chunks(spark, fragmented, target_file_bytes=1 << 30)
        expect_compacted = {e for e, st in before.items() if st["n_files"] >= 2}
        assert set(done) == expect_compacted

        after = chunk_file_stats(fragmented)
        assert all(st["n_files"] == 1 for st in after.values())
        # No scratch/trash residue: the swap completed for every chunk.
        residue = [
            e
            for e in os.listdir(fragmented)
            if e.startswith((".compact-", ".trash-"))
        ]
        assert residue == []

        after_rows = sorted(
            spark.read.parquet(fragmented).select("event_id").toPandas()["event_id"]
        )
        assert after_rows == before_rows

    def test_compaction_restores_sorted_files(self, spark, fragmented):
        # After compaction each chunk file is ts-sorted again (the
        # fragmentation above shuffled rows round-robin).
        df = spark.read.parquet(fragmented).withColumn("f", F.input_file_name())
        inv = (
            df.withColumn(
                "prev",
                F.lag("ts_us").over(
                    Window.partitionBy("f").orderBy(F.monotonically_increasing_id())
                ),
            )
            .filter(F.col("ts_us") < F.col("prev"))
            .count()
        )
        assert inv == 0

    def test_already_compact_chunks_are_left_alone(self, spark, fragmented):
        # Second pass: every chunk is now a single file, below
        # min_files_to_compact — nothing rewritten.
        assert compact_chunks(spark, fragmented, target_file_bytes=1 << 30) == {}


def test_dpp_join_prunes_at_runtime(spark):
    """q_chunk_dpp_join's scan carries a dynamicpruningexpression on
    the chunk column: the filtered calendar dim prunes chunk
    directories at RUNTIME via the reused broadcast, not post-scan."""
    from open_rust_timeseries_db_spark.queries import all_queries

    df = all_queries()["q_chunk_dpp_join"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()
    assert "PartitionFilters" in plan


class TestZorder:
    """Z-ordered chunks: lossless, and 2-D predicates prune files the
    ts-sorted layout must read — measured from the parquet footers
    themselves (file-level min/max overlap with the predicate box),
    not inferred from plan text."""

    @pytest.fixture(scope="class")
    def band(self, spark):
        # ~27%-wide symbol band placed mid-space, derived from the
        # tier's actual id range (sf0.001 has ~15 users, sf0.01 150).
        n = events_us(spark, SF_DIR).agg(F.max("user_id")).first()[0]
        return int(n * 0.27), int(n * 0.53)

    @pytest.fixture(scope="class")
    def both_layouts(self, spark, tmp_path_factory):
        from open_rust_timeseries_db_spark.sources.layout import (
            write_zorder_layout,
        )

        root = tmp_path_factory.mktemp("zorder")
        ev = events_us(spark, SF_DIR).select(
            "event_id", "user_id", "ts_us", "value"
        )
        sorted_path = str(root / "ts_sorted")
        z_path = str(root / "zordered")
        # Same file budget for both, several files per day chunk so
        # within-chunk clustering is measurable.
        write_time_layout(
            ev, sorted_path, ts_col="ts_us", n_range_partitions=96
        )
        write_zorder_layout(
            ev,
            z_path,
            ts_col="ts_us",
            key_col="user_id",
            n_range_partitions=96,
        )
        return sorted_path, z_path

    def _user_overlap_fraction(self, path: str, band) -> float:
        import pyarrow.parquet as pq

        lo, hi = band
        total = hits = 0
        for chunk_dir in sorted(os.listdir(path)):
            full = os.path.join(path, chunk_dir)
            if not chunk_dir.startswith("chunk_us=") or not os.path.isdir(full):
                continue
            for fname in os.listdir(full):
                if not fname.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(full, fname))
                idx = md.schema_arrow.get_field_index("user_id")
                fmin = min(
                    md.metadata.row_group(g).column(idx).statistics.min
                    for g in range(md.metadata.num_row_groups)
                )
                fmax = max(
                    md.metadata.row_group(g).column(idx).statistics.max
                    for g in range(md.metadata.num_row_groups)
                )
                total += 1
                if not (fmax < lo or fmin > hi):
                    hits += 1
        assert total > 30, f"too few files ({total}) to measure pruning"
        return hits / total

    def test_zorder_is_lossless(self, spark, both_layouts):
        _, z_path = both_layouts
        src = events_us(spark, SF_DIR).select(
            "event_id", "user_id", "ts_us", "value"
        )
        got = read_time_range(spark, z_path)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, src.collect())
        )

    def test_zorder_manifest_records_clustering(self, both_layouts):
        _, z_path = both_layouts
        man = read_manifest(z_path)
        assert man["order"]["type"] == "zorder"
        assert man["order"]["cols"] == ["ts_us", "user_id"]
        assert len(man["order"]["bounds"]) == 2

    def test_zorder_files_prune_the_symbol_band(self, both_layouts, band):
        sorted_path, z_path = both_layouts
        f_sorted = self._user_overlap_fraction(sorted_path, band)
        f_z = self._user_overlap_fraction(z_path, band)
        # ts-sorted files each span ~the whole symbol space: no file
        # can be skipped for a symbol predicate. Z-ordered files carry
        # tight symbol ranges: most files fall outside the band.
        assert f_sorted > 0.9, f_sorted
        assert f_z < 0.7, f_z
        assert f_z < f_sorted

    def test_zorder_scan_touches_fewer_files_at_runtime(
        self, spark, both_layouts, band
    ):
        lo, hi = band
        sorted_path, z_path = both_layouts

        def touched(path):
            df = read_time_range(spark, path).filter(
                F.col("user_id").between(lo, hi)
            )
            return len(_touched_files(df))

        assert touched(z_path) < touched(sorted_path)


def test_zorder_key_matches_python_morton(spark):
    """The Spark Morton expression must equal a bit-for-bit python
    reference over the full quantization corner set: bounds endpoints,
    mid-range values, and values that straddle quantization cells."""
    from open_rust_timeseries_db_spark.sources.layout import zorder_key

    bits = 8
    lo_x, hi_x = 100, 1_000_000
    lo_y, hi_y = -50, 49
    import itertools

    xs = [100, 101, 499_999, 999_999, 1_000_000]
    ys = [-50, -1, 0, 7, 49]
    rows = list(itertools.product(xs, ys))
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x",
            "y",
            zorder_key(
                [F.col("x"), F.col("y")],
                [(lo_x, hi_x), (lo_y, hi_y)],
                bits,
            ).alias("z"),
        ).collect()
    }

    top = (1 << bits) - 1

    def quant(v, lo, hi):
        q = int((float(v) - lo) / (hi - lo) * top)
        return max(0, min(top, q))

    def morton(qx, qy):
        z = 0
        for b in range(bits):
            z |= ((qx >> b) & 1) << (2 * b)
            z |= ((qy >> b) & 1) << (2 * b + 1)
        return z

    for x, y in rows:
        want = morton(quant(x, lo_x, hi_x), quant(y, lo_y, hi_y))
        assert got[(x, y)] == want, (x, y, got[(x, y)], want)


def test_zorder_write_rejects_empty_input(spark, tmp_path):
    """An empty (or all-null-ts) input has no bounds to quantize
    against: the write must fail with a clear ValueError, not a
    TypeError from float(None) deep in the key builder."""
    from open_rust_timeseries_db_spark.sources.layout import (
        write_zorder_layout,
    )

    empty = spark.createDataFrame([], "ts_us long, user_id long")
    with pytest.raises(ValueError, match="no non-null"):
        write_zorder_layout(
            empty, str(tmp_path / "z"), ts_col="ts_us", key_col="user_id"
        )


class TestAppendAndStreamingIngest:
    """The ingest lifecycle: appends reuse the manifest (and Z-grid),
    streamed micro-batches are replay-idempotent, and compaction folds
    the accumulated files without losing a row or the clustering."""

    def test_batch_appends_then_compaction_lossless(self, spark, tmp_path):
        from open_rust_timeseries_db_spark.sources.layout import (
            append_time_layout,
            chunk_file_stats,
            compact_chunks,
            read_manifest,
            read_time_range,
            write_time_layout,
        )

        ev = events_us(spark, SF_DIR).select(
            "event_id", "user_id", "ts_us", "value"
        )
        path = str(tmp_path / "appended")
        write_time_layout(
            ev.filter(F.col("event_id") % 3 == 0), path, ts_col="ts_us"
        )
        man_before = read_manifest(path)
        for r in (1, 2):
            append_time_layout(ev.filter(F.col("event_id") % 3 == r), path)
        assert read_manifest(path) == man_before, "append mutated manifest"

        def full_read():
            return {
                tuple(r)
                for r in read_time_range(spark, path).select(
                    "event_id", "user_id", "ts_us", "value"
                ).collect()
            }

        want = {tuple(r) for r in ev.collect()}
        assert full_read() == want
        pre = chunk_file_stats(path)
        done = compact_chunks(spark, path, target_file_bytes=8 << 20)
        assert done, f"nothing compacted over {pre}"
        assert full_read() == want, "compaction lost or duplicated rows"

    def test_zorder_append_reuses_grid_and_compaction_preserves_it(
        self, spark, tmp_path
    ):
        from open_rust_timeseries_db_spark.sources.layout import (
            append_time_layout,
            compact_chunks,
            read_manifest,
            read_time_range,
            write_zorder_layout,
        )

        ev = events_us(spark, SF_DIR).select(
            "event_id", "user_id", "ts_us", "value"
        )
        path = str(tmp_path / "zappend")
        write_zorder_layout(
            ev.filter(F.col("event_id") % 2 == 0),
            path,
            ts_col="ts_us",
            key_col="user_id",
        )
        man = read_manifest(path)
        # The append slice includes rows OUTSIDE the original bounds
        # only if the halves' extremes differ — either way the write
        # must succeed by clamping to the recorded grid, not recompute
        # bounds.
        append_time_layout(ev.filter(F.col("event_id") % 2 == 1), path)
        assert read_manifest(path) == man, "append mutated z-order manifest"
        compact_chunks(spark, path, target_file_bytes=8 << 20)
        assert read_manifest(path) == man
        got = {
            tuple(r)
            for r in read_time_range(spark, path).select(
                "event_id", "user_id", "ts_us", "value"
            ).collect()
        }
        assert got == {tuple(r) for r in ev.collect()}

    def test_streaming_ingest_replay_idempotent_and_compactable(
        self, spark, tmp_path
    ):
        from open_rust_timeseries_db_spark.sources.layout import (
            append_time_layout,
            chunk_file_stats,
            compact_chunks,
            read_time_range,
            stream_into_time_layout,
            write_time_layout,
        )

        ev = events_us(spark, SF_DIR).select(
            "event_id", "user_id", "ts_us", "value"
        )
        # Seed the layout (manifest) with a first slice; stream the rest
        # from a 3-file directory, one file per micro-batch.
        path = str(tmp_path / "streamed")
        seed = ev.filter(F.col("event_id") % 4 == 0)
        rest = ev.filter(F.col("event_id") % 4 != 0)
        write_time_layout(seed, path, ts_col="ts_us")
        src_dir = str(tmp_path / "src")
        rest.repartition(3).write.parquet(src_dir)
        stream = (
            spark.readStream.schema(rest.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = stream_into_time_layout(
            stream, path, str(tmp_path / "ckpt"), n_range_partitions=2
        )
        q.processAllAvailable()
        q.stop()

        def full_read():
            return {
                tuple(r)
                for r in read_time_range(spark, path).select(
                    "event_id", "user_id", "ts_us", "value"
                ).collect()
            }

        want = {tuple(r) for r in ev.collect()}
        assert full_read() == want

        # Replay a batch id that already committed: dynamic partition
        # overwrite must replace its own output, not append a copy.
        replay = rest.limit(50)
        append_time_layout(replay, path, ingest_id=0)
        append_time_layout(replay, path, ingest_id=0)
        n_after_replay = read_time_range(spark, path).count()

        # Compaction folds the per-trigger files (and the ingest
        # partition level) away; reads stay correct.
        compact_chunks(spark, path, target_file_bytes=8 << 20)
        st = chunk_file_stats(path)
        assert all("/" not in next(iter(st)) for _ in [0])
        assert read_time_range(spark, path).count() == n_after_replay


def test_replay_staging_failure_keeps_committed_batch(spark, tmp_path):
    """A replayed ingest batch stages to scratch BEFORE touching the
    previously committed copy: if the staging write fails (executor
    crash, bad input), the prior batch must remain fully readable.
    The pre-round-11 order deleted the batch id's files first, so a
    staging failure lost the committed batch entirely."""
    import os

    from open_rust_timeseries_db_spark.sources.layout import (
        append_time_layout,
        read_time_range,
        write_time_layout,
    )

    ev = events_us(spark, SF_DIR).select(
        "event_id", "user_id", "ts_us", "value"
    )
    path = str(tmp_path / "crash")
    write_time_layout(
        ev.filter(F.col("event_id") % 4 == 0), path, ts_col="ts_us"
    )
    batch = ev.filter(F.col("event_id") % 4 == 1)
    append_time_layout(batch, path, ingest_id=3)

    def full_read():
        return {
            tuple(r)
            for r in read_time_range(spark, path)
            .select("event_id", "user_id", "ts_us", "value")
            .collect()
        }

    want = full_read()
    # Same schema, same batch id, but the write itself fails at
    # execution time (assert_true raises inside the scan).
    bad = batch.filter(F.assert_true(F.lit(False)).isNull())
    with pytest.raises(Exception):
        append_time_layout(bad, path, ingest_id=3)
    assert full_read() == want
    # The committed batch's files survive under their ingest names and
    # no scratch staging directory is left behind.
    files = [
        f
        for entry in os.listdir(path)
        if entry.startswith("chunk_us=")
        for f in os.listdir(os.path.join(path, entry))
    ]
    assert any(f.startswith("ingest-3-") for f in files)
    assert not [e for e in os.listdir(path) if e.startswith(".ingest-")]


def test_retention_drops_only_fully_expired_chunks(spark, tmp_path):
    """drop_chunks_before is conservative: a chunk is deleted only when
    its WHOLE interval precedes the cutoff; reads after retention see
    exactly the surviving rows and the manifest stays intact."""
    from open_rust_timeseries_db_spark.sources.layout import (
        drop_chunks_before,
        read_manifest,
        read_time_range,
        write_time_layout,
    )

    ev = events_us(spark, SF_DIR).select("event_id", "ts_us")
    path = str(tmp_path / "ret")
    write_time_layout(ev, path, ts_col="ts_us")
    man = read_manifest(path)
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).first()
    # Cutoff mid-span, deliberately NOT on a chunk boundary.
    cutoff = (lo + hi) // 2 + man["chunk_us"] // 3
    dropped = drop_chunks_before(path, cutoff)
    assert dropped, "expected at least one fully-expired chunk"
    got = {tuple(r) for r in read_time_range(spark, path).collect()}
    # Conservative: every row >= cutoff MUST survive; rows below the
    # cutoff survive iff their chunk straddles it.
    chunk_us = man["chunk_us"]
    boundary = (cutoff // chunk_us) * chunk_us
    want = {
        tuple(r)
        for r in ev.filter(F.col("ts_us") >= boundary).collect()
    }
    assert got == want
    assert read_manifest(path) == man


def test_streaming_ingest_feeds_incremental_aggregate(spark, tmp_path):
    """The full ingest composition: micro-batches append into the
    chunked layout AND incrementally refresh the OHLC continuous
    aggregate in the same foreachBatch commit; the final bars must
    equal a full rebuild over everything the layout now holds."""
    from open_rust_timeseries_db_spark.queries.timeseries import (
        ohlc_increment,
    )
    from open_rust_timeseries_db_spark.sources.layout import (
        append_time_layout,
        read_time_range,
        write_time_layout,
    )
    from tests.test_continuous_aggregate import _full_build, _rows

    ev = events_us(spark, SF_DIR).select(
        "user_id", "ts_us", "value", "event_id"
    )
    path = str(tmp_path / "ca")
    seed = ev.filter(F.col("event_id") % 4 == 0)
    rest = ev.filter(F.col("event_id") % 4 != 0)
    write_time_layout(seed, path, ts_col="ts_us")
    bars = [_full_build(seed).persist()]
    bars[0].count()

    src_dir = str(tmp_path / "src")
    rest.repartition(3).write.parquet(src_dir)

    def ingest(batch_df, batch_id):
        append_time_layout(batch_df, path, ingest_id=batch_id)
        nxt = ohlc_increment(bars[0], batch_df).persist()
        nxt.count()  # materialize within the batch scope
        bars[0] = nxt

    q = (
        spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rebuilt = _full_build(
        read_time_range(spark, path).select(
            "user_id", "ts_us", "value", "event_id"
        )
    )
    assert _rows(bars[0]) == _rows(rebuilt)
