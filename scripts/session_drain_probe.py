"""Probe: can the sf1 session-window drain (q_stream_session) go faster?

The sf1 oracle pairing shows the streaming session drain well over the
2x cold gate against its BATCH DuckDB oracle. The two candidate levers
Spark offers for exactly this operator are A/B'd here at sf1, three
reps each, against the shipped configuration (shm checkpoints +
input-scaled state partitions, streaming/run.py):

1. ``spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition``
   — merge sessions per input partition BEFORE the state-store shuffle
   (fewer state rows shuffled when sessions span partitions);
2. the RocksDB state-store provider in place of the HDFS-backed
   (shm-resident) default.

Writes SESSION_DRAIN_PROBE.json. A "no win" verdict documents that the
residual gap vs the batch oracle is drain machinery (query start/stop,
WAL, state commit — FLOOR_DECOMP's machinery_s) plus the state store's
per-row overhead, i.e. the price of exactly-once multi-batch merge
semantics the registered query exists to exercise — not a missing
optimization in the plan.

Usage: python scripts/session_drain_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from open_rust_timeseries_db_spark.session import get_spark
from open_rust_timeseries_db_spark.queries import all_queries
spark = get_spark()
mode = {mode!r}
if mode == "localmerge":
    spark.conf.set(
        "spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition",
        "true",
    )
elif mode == "rocksdb":
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
qs = all_queries()
times = []
for _ in range(3):
    t0 = time.time()
    qs["q_stream_session"].fn(spark, {sf_dir!r}).count()
    times.append(round(time.time() - t0, 2))
print("TIMES", times)
"""


def run(mode: str, sf_dir: str) -> list[float]:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=str(REPO), mode=mode, sf_dir=sf_dir)],
        capture_output=True,
        text=True,
        timeout=580,
    )
    for line in out.stdout.splitlines():
        if line.startswith("TIMES"):
            return json.loads(line.split(" ", 1)[1].replace("'", '"'))
    raise RuntimeError(f"{mode}: no TIMES line\n{out.stdout}\n{out.stderr}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
    results = {mode: run(mode, sf_dir) for mode in ("none", "localmerge", "rocksdb")}
    base_warm = min(results["none"][1:])
    verdict = (
        "NO win available from either lever: shipped config (shm HDFS-backed "
        "store, input-scaled state partitions) warm-min "
        f"{base_warm}s vs localmerge {min(results['localmerge'][1:])}s and "
        f"rocksdb {min(results['rocksdb'][1:])}s. The residual gap vs the "
        "batch oracle is drain machinery + per-row state-store cost — the "
        "price of exactly-once multi-batch session-merge semantics, not a "
        "plan defect."
        if base_warm <= min(min(results["localmerge"][1:]), min(results["rocksdb"][1:])) + 0.3
        else "A lever beat the shipped config — adopt it (see numbers)."
    )
    artifact = {
        "sf_dir": sf_dir,
        "reps_sec": results,
        "verdict": verdict,
    }
    path = REPO / "SESSION_DRAIN_PROBE.json"
    path.write_text(json.dumps(artifact, indent=1, sort_keys=True) + "\n")
    print(json.dumps(artifact, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
