"""Synthesize an sf1 parity tier by 10x replication of sf0.1.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md; read-only). The
round-3 verdict asked for a larger tier as insurance against
size-dependent plan changes (AQE switches join/agg strategy on real
stats). Parity does NOT require reproducing the driver's generator:
the oracle comparison runs Spark and DuckDB over the SAME parquet, so
any deterministic tier exercises the plans — what matters is realistic
scale and intact key relationships.

Construction, seed-free and deterministic:
- 10 copies of every fact table, foreign keys remapped by per-copy
  strides so customer->orders->lineitem and part/supplier joins stay
  referentially intact; dimension tables (region, nation) unchanged.
- documents: copy 0 verbatim; copies 1-9 get a deterministic per-doc
  token permutation (LCG-seeded Fisher-Yates), so the corpus grows
  10x WITHOUT minting 9 near-duplicates of every doc — shingle-family
  pair counts stay realistic instead of exploding quadratically.
- embeddings: copies roll the vector by the copy index (cosine
  structure decorrelates); vec_id stride is a multiple of 100 so the
  vec_id%100==0 centroid convention yields 10x centroids and the
  vec_id<10 query set stays exactly copy 0's.

Usage: python scripts/gen_sf1.py [src_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /root/repo/testdata_sf1 (gitignored).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

COPIES = 10

# Row-group sizing for the replicated fact tables. The driver's sf0.1
# files are single-row-group parquet — fine at 10-MB scale, but a
# faithful 10x tier must preserve the property real large tables have:
# MANY independently-scannable chunks (a 100 TB table is thousands of
# files x row groups; scan parallelism comes from that, not from
# splitting inside a row group — byte-range splits finer than a row
# group schedule empty tasks, measured as the round-6 sf0.1 regression).
# ~64 groups per fact table (2 scan tasks/core on local[32]), floored
# by BYTES per group, not rows: a 64k-row floor kept the fat-row
# tables (documents ~800 B/row, embeddings ~1 KB/row) in ONE 40 MB
# group, which serialized every sf1 text-kernel scan onto a single
# task — the row floor only made sense for skinny TPC-H rows. Each
# group carries >=2 MB of in-memory data (~1 MB on disk), so footer
# stats / dictionary-restart overhead stays negligible either way.
_TARGET_GROUPS = 64
_MIN_GROUP_BYTES = 2 << 20
_MIN_GROUP_ROWS = 4096


def _write_grouped(tbl: pa.Table, path: Path) -> None:
    rows = tbl.num_rows
    if not rows:
        pq.write_table(tbl, path)
        return
    bytes_per_row = max(1, tbl.nbytes // rows)
    min_rows = max(_MIN_GROUP_ROWS, _MIN_GROUP_BYTES // bytes_per_row)
    rg = max(min_rows, rows // _TARGET_GROUPS)
    pq.write_table(tbl, path, row_group_size=rg)


def _stride(ids: np.ndarray, mult: int = 1) -> int:
    s = int(ids.max()) + 1
    return ((s + mult - 1) // mult) * mult


def _permute_text(text: str, seed: int) -> str:
    toks = [t for t in text.split(" ") if t]
    if len(toks) < 2:
        return text
    # LCG-seeded Fisher-Yates: deterministic, no global RNG state.
    state = (seed * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
    for i in range(len(toks) - 1, 0, -1):
        state = (state * 6364136223846793005 + 1442695040888963407) & (
            2**64 - 1
        )
        j = state % (i + 1)
        toks[i], toks[j] = toks[j], toks[i]
    return " ".join(toks)


def main() -> None:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    dst = Path(
        sys.argv[2]
        if len(sys.argv) > 2
        else Path(__file__).resolve().parent.parent / "testdata_sf1"
    )
    dst.mkdir(parents=True, exist_ok=True)

    t = {p.stem: pq.read_table(p) for p in src.glob("*.parquet")}

    for name in ("region", "nation"):
        pq.write_table(t[name], dst / f"{name}.parquet")

    cust = _stride(t["customer"]["c_custkey"].to_numpy())
    supp = _stride(t["supplier"]["s_suppkey"].to_numpy())
    part = _stride(t["part"]["p_partkey"].to_numpy())
    okey = _stride(t["orders"]["o_orderkey"].to_numpy())
    ev = _stride(t["events"]["event_id"].to_numpy())
    usr = _stride(t["events"]["user_id"].to_numpy())
    doc = _stride(t["documents"]["doc_id"].to_numpy())
    vec = _stride(t["embeddings"]["vec_id"].to_numpy(), mult=100)

    def replicate(name: str, shifts: dict[str, int]) -> None:
        tbl = t[name]
        chunks = []
        for k in range(COPIES):
            cols = {}
            for field in tbl.schema:
                arr = tbl[field.name]
                if field.name in shifts:
                    cols[field.name] = pa.array(
                        arr.to_numpy() + k * shifts[field.name],
                        type=field.type,
                    )
                else:
                    cols[field.name] = arr.combine_chunks()
            chunks.append(pa.table(cols, schema=tbl.schema))
        _write_grouped(pa.concat_tables(chunks), dst / f"{name}.parquet")

    replicate("customer", {"c_custkey": cust})
    replicate("supplier", {"s_suppkey": supp})
    replicate("part", {"p_partkey": part})
    replicate("orders", {"o_orderkey": okey, "o_custkey": cust})
    replicate(
        "lineitem",
        {"l_orderkey": okey, "l_partkey": part, "l_suppkey": supp},
    )
    replicate("events", {"event_id": ev, "user_id": usr})

    # documents: permuted-token copies.
    dtbl = t["documents"]
    ids = dtbl["doc_id"].to_numpy()
    texts = dtbl["text"].to_pylist()
    langs = dtbl["lang"].combine_chunks()
    srcs = dtbl["source"].combine_chunks()
    chunks = []
    for k in range(COPIES):
        new_texts = (
            texts
            if k == 0
            else [
                _permute_text(s, int(i) * COPIES + k)
                for i, s in zip(ids, texts)
            ]
        )
        chunks.append(
            pa.table(
                {
                    "doc_id": pa.array(ids + k * doc, type=pa.int64()),
                    "text": pa.array(new_texts, type=pa.string()),
                    "lang": langs,
                    "source": srcs,
                    "n_chars": pa.array(
                        np.array([len(s) for s in new_texts], dtype=np.int64)
                    ),
                },
                schema=dtbl.schema,
            )
        )
    _write_grouped(pa.concat_tables(chunks), dst / "documents.parquet")

    # embeddings: rolled-vector copies.
    etbl = t["embeddings"]
    vids = etbl["vec_id"].to_numpy()
    embs = [np.asarray(v, dtype=np.float32) for v in etbl["embedding"].to_pylist()]
    labels = etbl["label"].combine_chunks()
    chunks = []
    for k in range(COPIES):
        rolled = embs if k == 0 else [np.roll(v, k) for v in embs]
        chunks.append(
            pa.table(
                {
                    "vec_id": pa.array(vids + k * vec, type=pa.int64()),
                    "embedding": pa.array(
                        [v.tolist() for v in rolled],
                        type=pa.list_(pa.float32()),
                    ),
                    "label": labels,
                },
                schema=etbl.schema,
            )
        )
    _write_grouped(pa.concat_tables(chunks), dst / "embeddings.parquet")

    for p in sorted(dst.glob("*.parquet")):
        print(f"{p.name}: {pq.read_metadata(p).num_rows} rows")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
