"""Generate an honest N× scale-up of an sf directory for local scaling
measurements (BASELINE.md): every table is replicated with its keys
offset per replica so join fan-out, group cardinalities and dup-group
sizes scale the way real data growth does (NOT a naive row copy, which
would inflate joins quadratically).

  region/nation          : fixed dimensions, copied once
  customer/supplier/part : surrogate keys offset per replica
  orders                 : o_orderkey/o_custkey offset
  lineitem               : l_orderkey/l_partkey/l_suppkey offset
  events                 : event_id/user_id offset (ts kept: same time range,
                           N× denser — how event streams actually grow)
  documents              : doc_id offset, text copied (dup clusters
                           grow N×, the adversarial case for dedup)
  embeddings             : vec_id offset, vectors copied

Every table is written with ROW_GROUP_SIZE chosen for >=32 row groups
(min 2,048 rows per group): DuckDB's default 122,880-row groups left
sf1/sf10 replicas with 1-2 groups per file, capping Spark's scan
parallelism and under-reporting compute headroom in the scaling
tables (round-3 builder note on doc_line_clean/doc_rare_token_rate).

Usage: python tools/make_sf_replica.py [src_sf_dir] [out_dir] [N]
Defaults: /root/testdata/sf0.1 /tmp/testdata/sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = {
    "region": None,
    "nation": None,
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, keys in TABLES.items():
        src_file = f"{src}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        src_rows = con.execute(f"SELECT count(*) FROM '{src_file}'").fetchone()[0]
        if keys is None:
            rg = max(2048, src_rows // 32 or 1)
            con.execute(
                f"COPY (SELECT * FROM '{src_file}') TO '{dst}' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
            )
            continue
        rg = max(2048, (src_rows * n) // 32)
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src_file}'").fetchall()]
        offsets = {
            k: con.execute(f"SELECT max({k}) + 1 FROM '{src_file}'").fetchone()[0]
            for k in keys
        }
        sel = ", ".join(
            f"{c} + rep * {offsets[c]} AS {c}" if c in offsets else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{src_file}', range({n}) r(rep)) "
            f"TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
        )
        print(t, "x", n, "->", dst, f"(row_group_size={rg})")


if __name__ == "__main__":
    main()
