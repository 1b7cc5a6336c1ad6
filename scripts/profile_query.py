"""Isolated cold/warm profile for named queries.

bench.py's "cold" runs queries alphabetically in ONE session, so a
query's cold number can hit (or be charged for) a session cache a
sibling built. This script answers the attribution question: for each
named query it starts a FRESH tuned session, applies bench.py's
session warmups (JVM/codegen, Arrow worker pool, streaming machinery —
one-time costs that are not the query's), then times pass 1 (true
isolated cold, session-cache builds included) and pass 2 (warm), and
reports the Spark job count per pass from the status tracker.

Usage:
    python scripts/profile_query.py q_lm_score q_ann_ivf [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def warmup(spark) -> None:
    from pyspark.sql import functions as F

    from open_rust_timeseries_db_spark.functions.vectors import dot_fx_pd

    spark.range(32).select(
        dot_fx_pd(F.array(F.lit(1.0)), F.array(F.lit(1.0)))
    ).write.format("noop").mode("overwrite").save()

    def _noop_batches(batches):
        for pdf in batches:
            yield pdf

    spark.range(64).repartition(32).mapInPandas(
        _noop_batches, "id long"
    ).write.format("noop").mode("overwrite").save()


def main() -> None:
    names = [a for a in sys.argv[1:] if a.startswith("q_")]
    dirs = [a for a in sys.argv[1:] if not a.startswith("q_")]
    sf_dir = dirs[0] if dirs else "/root/testdata/sf0.1"

    from open_rust_timeseries_db_spark.queries import all_queries
    from open_rust_timeseries_db_spark.session import get_spark

    specs = all_queries()
    out = {}
    for name in names:
        spark = get_spark(f"profile-{name}")
        spark.sparkContext.setLogLevel("ERROR")
        warmup(spark)
        tracker = spark.sparkContext.statusTracker()
        rows = []
        jobs = []
        for pass_i in range(2):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            rows.append(round(dt, 3))
            jobs.append(len(tracker.getJobIdsForGroup(None) or []) - j0)
        out[name] = {
            "cold": rows[0],
            "warm": rows[1],
            "jobs_cold": jobs[0],
            "jobs_warm": jobs[1],
        }
        print(name, out[name], flush=True)
        spark.stop()
        # clear session-scoped python caches between queries
        from open_rust_timeseries_db_spark.functions import text_kernels

        text_kernels._CKPT_CACHE.clear()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
