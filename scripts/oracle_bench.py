"""Time every DuckDB oracle at an sf dir and compare to a bench.py run.

The driver's perf gate (BASELINE.md) is per-query Spark wall-time ≤ 2×
the DuckDB oracle on the same tables at sf0.1. This script produces the
DuckDB side: it registers the testdata parquet as views, runs each
registered oracle twice (min-of-passes, same policy as bench.py), and —
if given a bench.py JSON line — prints the ratio table sorted worst
first.

It also writes ORACLE_BENCH.json at the repo root: per-query oracle
seconds (+ spark seconds and ratios when a bench file is given), so the
2x gate is machine-checkable from the committed tree every round
instead of re-measured by hand.

Usage:
    python scripts/oracle_bench.py [sf_dir] [bench_json_path]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open_rust_timeseries_db_spark.queries import all_queries  # noqa: E402

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bench_path = sys.argv[2] if len(sys.argv) > 2 else None

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    specs = all_queries()
    duck_t: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        if not spec.oracle:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        duck_t[name] = best

    spark_t: dict[str, float] = {}
    if bench_path:
        spark_t = json.load(open(bench_path))["queries"]

    print(f"{'query':30s} {'duck':>7s} {'spark':>7s} {'ratio':>6s}")
    rows = []
    for name, dt in duck_t.items():
        st = spark_t.get(name)
        ratio = (st / dt) if st is not None and dt > 0 else None
        rows.append((name, dt, st, ratio))
    rows.sort(key=lambda r: -(r[3] or 0))
    n_fail = 0
    for name, dt, st, ratio in rows:
        flag = ""
        if ratio is not None and ratio > 2.0:
            flag = "  <-- over 2x gate"
            n_fail += 1
        print(
            f"{name:30s} {dt:7.3f} "
            f"{st if st is not None else float('nan'):7.3f} "
            f"{ratio if ratio is not None else float('nan'):6.2f}{flag}"
        )
    print(f"== {len(rows) - n_fail} within gate, {n_fail} over ==")
    print(json.dumps({"duck_total": round(sum(duck_t.values()), 3)}))

    out = {
        "sf_dir": sf_dir,
        "policy": "min of 2 passes, same as bench.py",
        "queries": {
            name: {
                "oracle_sec": round(dt, 4),
                "spark_sec": (round(st, 4) if st is not None else None),
                "ratio": (round(ratio, 2) if ratio is not None else None),
            }
            for name, dt, st, ratio in rows
        },
        "oracle_total_sec": round(sum(duck_t.values()), 3),
        "n_over_2x": n_fail,
    }
    out_path = Path(__file__).resolve().parent.parent / "ORACLE_BENCH.json"
    out_path.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
