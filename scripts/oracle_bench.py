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
    python scripts/oracle_bench.py [sf_dir] [bench_json_path] [out_name]

``out_name`` defaults to ORACLE_BENCH.json; the sf1 sweep passes
ORACLE_BENCH_SF1.json. ``ORACLE_BENCH_SKIP`` (comma-separated query
names) skips oracles that are intractable at the given tier
(q_dedup_clusters' recursive-CTE oracle runs >45 min at sf1).
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
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bench_path = sys.argv[2] if len(sys.argv) > 2 else None
    out_name = sys.argv[3] if len(sys.argv) > 3 else "ORACLE_BENCH.json"
    skip = {
        s.strip()
        for s in os.environ.get("ORACLE_BENCH_SKIP", "").split(",")
        if s.strip()
    }

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    specs = all_queries()
    duck_cold: dict[str, float] = {}
    duck_warm: dict[str, float] = {}
    oracle_kind: dict[str, str] = {}
    for name, spec in sorted(specs.items()):
        if not spec.oracle:
            continue
        if name in skip:
            # A skipped SQL oracle with a PRECOMPUTED independent
            # oracle shipped next to the parquet (gen_sf1's SimHash ->
            # band-block -> union-find pipeline, bridge-tested against
            # the recursive CTE at tractable tiers) still gets a bench
            # row: the oracle side is the union-find oracle COMPUTED
            # here (numpy/stdlib single-node work — the honest
            # alternative-engine cost), never a bare parquet read,
            # and the row is labeled so the ratio's basis is explicit.
            if name != "q_dedup_clusters" or not (
                Path(sf_dir) / "expected_dedup_clusters.parquet"
            ).exists():
                continue
            import importlib.util

            gpath = Path(__file__).resolve().parent / "gen_sf1.py"
            mspec = importlib.util.spec_from_file_location("gen_sf1", gpath)
            gen_sf1 = importlib.util.module_from_spec(mspec)
            mspec.loader.exec_module(gen_sf1)
            ids, texts = con.execute(
                "SELECT doc_id, text FROM documents"
            ).fetchnumpy()["doc_id"], [
                r[0]
                for r in con.execute("SELECT text FROM documents").fetchall()
            ]
            for i in range(2):
                t0 = time.perf_counter()
                gen_sf1.expected_dedup_clusters(ids, texts)
                dt = time.perf_counter() - t0
                if i == 0:
                    duck_cold[name] = dt
                duck_warm[name] = min(duck_warm.get(name, dt), dt)
            oracle_kind[name] = "precomputed_union_find_python"
            continue
        best = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            dt = time.perf_counter() - t0
            if i == 0:
                duck_cold[name] = dt
            best = min(best, dt)
        duck_warm[name] = best

    spark_cold: dict[str, float] = {}
    spark_warm: dict[str, float] = {}
    if bench_path:
        bench = json.load(open(bench_path))
        spark_warm = bench["queries"]
        # Older BENCH files predate the cold column; fall back to warm
        # (flagged in the policy string below).
        spark_cold = bench.get("queries_cold", spark_warm)

    # The 2x gate (BASELINE.md) is judged on COLD: what a first
    # invocation in a fresh session pays, session-cache materialization
    # included. Warm (min of passes) is the long-lived-session number —
    # reported, not gated (round-2 verdict: min-of-passes flattered the
    # cached dedup family).
    print(f"{'query':30s} {'d.cold':>7s} {'d.warm':>7s} {'s.cold':>7s} "
          f"{'s.warm':>7s} {'r.cold':>6s} {'r.warm':>6s}")
    rows = []
    for name in duck_cold:
        dc, dw = duck_cold[name], duck_warm[name]
        sc, sw = spark_cold.get(name), spark_warm.get(name)
        rc = (sc / dc) if sc is not None and dc > 0 else None
        rw = (sw / dw) if sw is not None and dw > 0 else None
        rows.append((name, dc, dw, sc, sw, rc, rw))
    rows.sort(key=lambda r: -(r[5] or 0))
    n_fail_cold = n_fail_warm = 0
    nan = float("nan")
    for name, dc, dw, sc, sw, rc, rw in rows:
        flag = ""
        if rc is not None and rc > 2.0:
            flag = "  <-- over 2x gate (cold)"
            n_fail_cold += 1
        if rw is not None and rw > 2.0:
            n_fail_warm += 1
        print(
            f"{name:30s} {dc:7.3f} {dw:7.3f} "
            f"{sc if sc is not None else nan:7.3f} "
            f"{sw if sw is not None else nan:7.3f} "
            f"{rc if rc is not None else nan:6.2f} "
            f"{rw if rw is not None else nan:6.2f}{flag}"
        )
    print(
        f"== cold: {len(rows) - n_fail_cold} within gate, {n_fail_cold} over"
        f" | warm: {len(rows) - n_fail_warm} within, {n_fail_warm} over =="
    )
    if bench_path and (bench or {}).get("cache_builds"):
        print("-- shared-artifact cache builds (charged to their own "
              "lines, not to queries) --")
        for bname, sec in sorted((bench or {})["cache_builds"].items()):
            print(f"{bname:30s} {sec:7.3f}s")
        print(f"{'cache_build_total':30s} "
              f"{(bench or {}).get('cache_build_total', 0):7.3f}s")
    print(json.dumps({"duck_total_warm": round(sum(duck_warm.values()), 3)}))

    repo = Path(__file__).resolve().parent.parent
    decomp: dict = {}
    for fname in ("FLOOR_DECOMP.json", "FLOOR_DECOMP_SF1.json"):
        decomp_path = repo / fname
        if not decomp_path.exists():
            continue
        try:
            d = json.loads(decomp_path.read_text())
        except ValueError:
            continue
        # Only attach the decomposition measured at this sweep's tier.
        if d.get("sf_dir") == sf_dir:
            decomp = d.get("queries", {})
            break

    out = {
        "sf_dir": sf_dir,
        "policy": (
            "cold = pass 1 after a separately-timed cache-build phase "
            "(shared session artifacts are charged to their own "
            "cache_builds lines, so per-query cold reflects per-query "
            "work), warm = min of 2 passes; gate judged on cold"
            + ("" if "queries_cold" in (bench or {}) else
               "; WARNING: bench file had no queries_cold, cold==warm")
            + (
                "; " + bench["merge_policy"]
                if (bench or {}).get("merge_policy")
                else ""
            )
            if bench_path
            else "cold = pass 1, warm = min of 2 passes; no bench file"
        ),
        "queries": {
            name: {
                "oracle_cold_sec": round(dc, 4),
                "oracle_warm_sec": round(dw, 4),
                "spark_cold_sec": (round(sc, 4) if sc is not None else None),
                "spark_warm_sec": (round(sw, 4) if sw is not None else None),
                "ratio_cold": (round(rc, 2) if rc is not None else None),
                "ratio_warm": (round(rw, 2) if rw is not None else None),
                # Fixed-floor attribution measured by
                # scripts/floor_decomposition.py (plan-build py4j time,
                # job count, driver/AQE gap vs in-job time): the
                # per-row evidence behind the "over-gate rows are
                # scheduling floor, not plan defects" claim.
                "decomp": decomp.get(name),
                # Present only when the oracle side is NOT the DuckDB
                # SQL (e.g. the sf1 union-find clustering oracle).
                **(
                    {"oracle_kind": oracle_kind[name]}
                    if name in oracle_kind
                    else {}
                ),
            }
            for name, dc, dw, sc, sw, rc, rw in rows
        },
        "oracle_total_warm_sec": round(sum(duck_warm.values()), 3),
        "oracle_total_cold_sec": round(sum(duck_cold.values()), 3),
        "n_over_2x": n_fail_cold,
        "n_over_2x_warm": n_fail_warm,
        # Shared-artifact build lines from the bench's cache-build
        # phase (see bench.py): the session-state cost that per-query
        # cold no longer hides. DuckDB has no session-cache analog —
        # every oracle rebuilds from the raw parquet — so the honest
        # full-engine comparison is (cache_build_total + spark cold
        # total) vs the oracle cold total.
        "cache_builds": (bench or {}).get("cache_builds")
        if bench_path
        else None,
        "cache_build_total_sec": (bench or {}).get("cache_build_total")
        if bench_path
        else None,
    }
    out_path = Path(__file__).resolve().parent.parent / out_name
    out_path.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
