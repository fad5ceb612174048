"""Scale probe: cluster-output dedup stays LINEAR in corpus size.

Round-2 VERDICT: the sf10 replica emitted 1.009B SimHash *pairs* —
pair enumeration is quadratic in duplicate-cluster depth (the replica
grows every dup cluster 10x/100x, the adversarial case). This probe
runs `dedup_clusters` (simhash scale path, xxhash64) on the same
replicas and records output rows + wall time, demonstrating the
cluster form is the safe default at 100 TB:

  sf    docs       pair-form output      cluster-form output
  0.1   5,000      2,932 pairs           5,000 label rows
  1     50,000     250,600 pairs         50,000 label rows
  10    500,000    1,009,093,696 pairs*  500,000 label rows
        (*round-2 BASELINE.md measurement)

Usage: python tools/probe_clusters.py [sf1_dir] [sf10_dir]
Builds /tmp/testdata/sf{1,10} from sf0.1 via make_sf_replica if absent.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from malstrom_spark.functions import dedup  # noqa: E402
from malstrom_spark.session import build_session  # noqa: E402


def ensure_replica(out_dir: str, n: int) -> None:
    if os.path.exists(f"{out_dir}/documents.parquet"):
        return
    subprocess.run(
        [sys.executable, "/root/repo/tools/make_sf_replica.py",
         "/root/testdata/sf0.1", out_dir, str(n)],
        check=True,
    )


def main():
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf10"
    ensure_replica(sf1, 10)
    ensure_replica(sf10, 100)
    spark = build_session(app_name="probe-clusters")
    out = {}
    for (name, d), method in [
        (("sf1", sf1), "simhash"),
        (("sf10", sf10), "simhash"),
        (("sf10_minhash", sf10), "minhash"),
    ]:
        docs = spark.read.parquet(f"{d}/documents.parquet").select("doc_id", "text")
        n_docs = docs.count()
        t0 = time.perf_counter()
        labels = dedup.dedup_clusters(
            docs, "doc_id", method=method, max_hamming=3, threshold=0.5, portable=False
        )
        row = labels.agg(
            F.count("*").alias("rows"),
            F.countDistinct("group_id").alias("groups"),
            F.sum(F.col("is_keeper").cast("long")).alias("keepers"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        out[name] = {
            "docs": n_docs,
            "label_rows": row["rows"],
            "groups": row["groups"],
            "keepers": row["keepers"],
            "wall_sec": round(dt, 1),
        }
        print(name, out[name], flush=True)
        assert row["rows"] == n_docs, "cluster output must be one row per doc"
        assert row["keepers"] == row["groups"], "one keeper per group"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
