"""Generate an honest N× scale-up of an sf directory for local scaling
measurements (BASELINE.md): every table is replicated with its keys
offset per replica so join fan-out, group cardinalities and dup-group
sizes scale the way real data growth does (NOT a naive row copy, which
would inflate joins quadratically).

  region/nation          : fixed dimensions, copied once
  customer/supplier/part : surrogate keys offset per replica
  orders                 : o_orderkey/o_custkey offset
  lineitem               : l_orderkey/l_partkey/l_suppkey offset
  events                 : user_id offset (ts kept: same time range,
                           N× denser — how event streams actually grow)
  documents              : doc_id offset, text copied (dup clusters
                           grow N×, the adversarial case for dedup)
  embeddings             : vec_id offset, vectors copied

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
    "events": ["user_id"],
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
        if keys is None:
            con.execute(
                f"COPY (SELECT * FROM '{src_file}') TO '{dst}' (FORMAT PARQUET)"
            )
            continue
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
            f"TO '{dst}' (FORMAT PARQUET)"
        )
        print(t, "x", n, "->", dst)


if __name__ == "__main__":
    main()
