"""Simulate the verification driver against __spark_entry__.py.

Mirrors the driver contract end-to-end: a VANILLA SparkSession (none of
this package's tuned confs), entry() smoke at sf0.001, then every
queries() entry vs its oracle_sql() on DuckDB at sf0.01 with an
order-insensitive value-hash compare (columns sorted by name, rows
sorted, values stringified, sha256).

Usage: python scripts/driver_sim.py [sf_dir]

``SPARK_GRAFT_ANSI=1`` runs the whole pass under
``spark.sql.ansi.enabled=true``: ANSI mode turns silent integer
overflow / invalid casts into loud errors, so a green run proves no
query result depends on a silent wrap anywhere (round-5 verdict item
7; the fixed-point DECIMAL accumulators are supposed to make wraps
impossible — this verifies it end-to-end).
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as contract  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else list(v)
        return "[" + ",".join(norm_cell(x) for x in seq) + "]"
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    body = df[cols].map(norm_cell)
    rows = sorted(body.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    from pyspark.sql import SparkSession

    # Vanilla session — deliberately NOT our get_spark(); the driver
    # builds its own. Queries must self-provision runtime confs.
    import os

    ansi = os.environ.get("SPARK_GRAFT_ANSI") == "1"
    builder = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim" + ("-ansi" if ansi else ""))
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
    )
    # Session stays vanilla for the sf0.01 contract; the sf1 sweep's
    # toPandas collections (50k-row result sets) overflow the 1g
    # default driver heap, so an EXPLICIT memory env is honored — the
    # real driver's session is not heap-starved either.
    if os.environ.get("SPARK_DRIVER_MEMORY"):
        builder = builder.config(
            "spark.driver.memory", os.environ["SPARK_DRIVER_MEMORY"]
        )
    if ansi:
        builder = builder.config("spark.sql.ansi.enabled", "true")
    spark = builder.getOrCreate()
    if ansi:
        print("[ansi] spark.sql.ansi.enabled=true for this pass")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    rows = contract.entry(spark).collect()
    print(f"[smoke] entry() -> {len(rows)} rows; first: {rows[0] if rows else None}")
    assert len(rows) > 0

    qs, oracles = contract.queries(), contract.oracle_sql()
    # SPARK_GRAFT_SKIP: comma-separated names whose SQL ORACLE is
    # intractable at the given tier (q_dedup_clusters' recursive-CTE
    # oracle runs >45 min at sf1). When the tier ships a PRECOMPUTED
    # independent oracle next to the parquet (gen_sf1 writes
    # expected_dedup_clusters.parquet: SimHash -> band blocking ->
    # union-find in numpy/stdlib, bridge-tested against the CTE oracle
    # at every tractable tier in tests/test_oracle_parity.py), the
    # query is NOT skipped: its oracle SQL is swapped for a read of
    # that file and the full rows/schema/hash compare runs — the sf1
    # tier counts all registered queries. A bare skip remains only for
    # a tier with no precomputed file; never set for the sf0.01 tier.
    skip = {
        s.strip()
        for s in os.environ.get("SPARK_GRAFT_SKIP", "").split(",")
        if s.strip()
    }
    precomputed = {"q_dedup_clusters": "expected_dedup_clusters.parquet"}
    n_pass = n_fail = 0
    for name, fn in sorted(qs.items()):
        if name in skip:
            pre = Path(SF_DIR) / precomputed.get(name, "__none__")
            if pre.exists():
                oracles = dict(oracles)
                oracles[name] = f"SELECT * FROM read_parquet('{pre}')"
                print(
                    f"[precomputed-oracle] {name}: SQL oracle intractable"
                    f" at this tier; comparing against {pre.name}"
                )
            else:
                print(f"[SKIP] {name}: oracle intractable at this tier")
                continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: spark raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows in {dt:.2f}s")
            n_pass += 1
            continue
        want = con.sql(oracles[name]).df()
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        status = "PASS" if ok_hash else "FAIL"
        print(
            f"[{status}] {name}: rows {len(got)}/{len(want)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} ({dt:.2f}s)"
        )
        n_pass += ok_hash
        n_fail += not ok_hash
    print(f"== {n_pass} pass, {n_fail} fail ==")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
