"""Scaled-k SemDeDup probe: flat vs two-level integer assignment.

SemDeDup's production regime scales the cluster count k with the
corpus (constant mean cluster size keeps the within-cluster pair join
linear), which makes the flat O(n x k) assignment the quadratic term
— the same wall the bitext probe hit (BASELINE.md round-12 #3), with
an extra twist: the flat Arrow argmin is an int64 matmul, which numpy
executes WITHOUT BLAS (no integer GEMM), so the flat path's constant
factor is far worse than the float engines'.

Same methodology as tools/probe_r12_hier.py: honest keyed replicas,
warm min-of-2 (cap 1200 s -> min-of-1), noop-write materialization,
k = 8 * mult, frozen head-row quantizer (leaves = first k embeddings
quantized; supers = first ~sqrt(k)).

Usage: python tools/probe_r12_semdedup_hier.py [flat|hier ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from malstrom_spark.queries import table  # noqa: E402
from malstrom_spark.session import build_session  # noqa: E402

SCALES = [
    ("/root/testdata/sf0.1", 1),
    ("/tmp/testdata/sf10", 100),
    ("/tmp/testdata/sf100", 1000),
]

SECOND_RUN_CAP_SEC = 1200.0


def _build(spark, sf_dir, mult, hier):
    from malstrom_spark.functions import similarity

    emb = table(spark, sf_dir, "embeddings")
    k = 8 * mult
    cents = similarity.semdedup_head_centroids(emb, "vec_id", "embedding", k)
    sup = None
    if hier:
        n_super = max(2, int(round(k**0.5)))
        sup = cents[:n_super]
    return similarity.semdedup(
        emb, "vec_id", "embedding", cents, threshold=0.9,
        super_centroids=sup,
    )


def _min_of_2(build):
    times = []
    for _ in range(2):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
        if times[-1] > SECOND_RUN_CAP_SEC:
            print(f"    (min-of-1: first run {times[-1]:.0f}s > cap)", flush=True)
            break
    return min(times)


def main():
    only = set(sys.argv[1:]) or {"flat", "hier"}
    spark = build_session(app_name="probe-r12-semdedup-hier")
    for mode in ["flat", "hier"]:
        if mode not in only:
            continue
        ts = []
        for sf_dir, mult in SCALES:
            t = _min_of_2(lambda d=sf_dir, m=mult: _build(spark, d, m, mode == "hier"))
            print(f"  semdedup_{mode}_scaled_k @ {sf_dir}: {t:.2f}s", flush=True)
            ts.append(t)
        if len(ts) == 3:
            e1 = math.log(ts[1] / ts[0]) / math.log(100)
            e2 = math.log(ts[2] / ts[1]) / math.log(10)
            print(f"semdedup_{mode}_scaled_k | exp 0.1->10: {e1:.2f} "
                  f"| exp 10->100: {e2:.2f}", flush=True)


if __name__ == "__main__":
    main()
