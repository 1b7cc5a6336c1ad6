"""A/B a prior round's tree against HEAD on THIS host for target colds.

Round 11 committed a 3x cold regression on q_dedup_clusters (5.50 ->
17.93 s median; rolls 9.4/17.9/26.5 s) and a bimodal q_embedding_neardup
(1.0/6.7/6.0 s) with only a prose "the box is slower" note. The round-11
verdict (Next round #1) demands A/B numbers on ONE host, same day, pinned
tree vs HEAD — host-vs-code as a measurement.

Method: `git worktree add` the pinned ref, then run each tree's OWN
bench.py with SPARK_GRAFT_ONLY=<targets> (full session warmup + full
cache-build phase, exactly the committed-bench protocol), interleaved
A/B/A/B/... so host drift hits both trees equally. Each run is a fresh
JVM/process. The per-run stderr line carries per-query cold/warm; the
stdout compact line carries cache_build_total.

Usage:
  python scripts/cold_regression_probe.py [ref] [n_rolls] [q1,q2,...]
Defaults: ref=64859fd (round-10 snapshot), 3 rolls,
  q_dedup_clusters,q_embedding_neardup.
Writes: DEDUP_CC_PROBE.json at the repo root.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def ensure_worktree(ref: str) -> Path:
    path = Path(f"/tmp/sg_tree_{ref}")
    if not (path / "bench.py").exists():
        subprocess.run(
            ["git", "worktree", "add", "--force", str(path), ref],
            cwd=REPO, check=True, capture_output=True,
        )
    return path


def run_once(tree: Path, sf_dir: str, queries: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_ONLY"] = queries
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=tree, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench.py failed in {tree}:\n{proc.stderr[-3000:]}"
        )
    rec: dict = {}
    for line in proc.stderr.splitlines():
        line = line.strip()
        if line.startswith('{"cold"'):
            rec = json.loads(line)
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith('{"metric"'):
            rec["cache_build_total"] = json.loads(line).get(
                "cache_build_total"
            )
    if "cold" not in rec:
        raise RuntimeError(f"no cold/warm stderr line from {tree}")
    return rec


def main() -> None:
    ref = sys.argv[1] if len(sys.argv) > 1 else "64859fd"
    n_rolls = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    queries = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "q_dedup_clusters,q_embedding_neardup"
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    old_tree = ensure_worktree(ref)
    trees = {f"r10_{ref}": old_tree, "head": REPO}

    runs: dict[str, list[dict]] = {k: [] for k in trees}
    for roll in range(n_rolls):
        for label, tree in trees.items():
            rec = run_once(tree, sf_dir, queries)
            runs[label].append(rec)
            print(
                f"roll {roll + 1} {label}: "
                + json.dumps(rec, separators=(",", ":")),
                file=sys.stderr,
            )

    qnames = sorted(runs["head"][0]["cold"])
    summary = {
        label: {
            "median_cold": {
                q: round(statistics.median(r["cold"][q] for r in rs), 3)
                for q in qnames
            },
            "median_warm": {
                q: round(statistics.median(r["warm"][q] for r in rs), 3)
                for q in qnames
            },
            "median_cache_build_total": round(
                statistics.median(
                    r["cache_build_total"] for r in rs
                    if r.get("cache_build_total") is not None
                ), 3,
            ),
        }
        for label, rs in runs.items()
    }
    result = {
        "policy": (
            "interleaved A/B on one host, fresh process per run, each "
            "tree's own bench.py with SPARK_GRAFT_ONLY (full warmup + "
            "cache builds); medians over rolls"
        ),
        "ref": ref,
        "sf_dir": sf_dir,
        "queries": qnames,
        "n_rolls": n_rolls,
        "summary": summary,
        "runs": runs,
    }
    out = REPO / "DEDUP_CC_PROBE.json"
    out.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(summary, separators=(",", ":")))


if __name__ == "__main__":
    main()
