"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is planned and fully executed (results drained via a count of
the final DataFrame's rows through ``toLocalIterator``-free collect-less
``count()`` on a cached-free plan; we use ``df.write.format("noop")`` so
the whole plan runs at executor parallelism with zero driver collect
cost — the honest way to time a distributed plan).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from open_rust_timeseries_db_spark.queries import all_queries  # noqa: E402
from open_rust_timeseries_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_queries()
    timings: dict[str, float] = {}
    # Warm the session (JVM/codegen/parquet footer caches) on one tiny
    # query so the first measured query isn't charged for JVM warmup.
    specs["q_minmax_value"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    # Warm the Python/Arrow worker pool (workers are reused afterwards)
    # so the first pandas-UDF query isn't charged worker spin-up.
    from pyspark.sql import functions as F

    from open_rust_timeseries_db_spark.functions.vectors import dot_fx_pd

    spark.range(32).select(
        dot_fx_pd(F.array(F.lit(1.0)), F.array(F.lit(1.0)))
    ).write.format("noop").mode("overwrite").save()

    # Two timed passes, report the per-query MIN. Pass 1 additionally
    # pays each query's one-time JIT/codegen compilation; taking the
    # minimum reads through both that and transient VM interference
    # (host CPU steal hits whichever query is running during a throttle
    # window — rarely the same query in both passes). The min is the
    # steady-state throughput a long-lived cluster session sees. Two
    # passes, not three: at ~77 queries a third pass adds minutes of
    # wall-clock for marginal noise reduction, and the harness budget
    # is better spent finishing than re-measuring.
    for _ in range(2):
        for name, spec in sorted(specs.items()):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 4)
            timings[name] = min(timings.get(name, elapsed), elapsed)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
