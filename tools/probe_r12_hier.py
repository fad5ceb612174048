"""Round-12 follow-up: does the two-level quantizer remove the
flat-assignment wall in corpus-scaled-n_lists bitext mining?

Same methodology as tools/probe_r12.py bitext_ivf_scaled_lists
(honest keyed replica, warm min-of-2, noop-write, n_lists = 8 * mult
so mean cell size is constant across decades), but assignment routed
through ivf_assign_hier: supers = first ~sqrt(n_lists) embeddings,
leaves = the same first-n_lists head rows the flat probe used,
attached by integer argmin; n_probe_super = 3.

Per-vector assignment work: flat = n_lists distances; hier =
n_super + n_probe_super * (n_lists / n_super) ~ 4 sqrt(n_lists).
At n_lists = 8000 that is ~8000 vs ~360 — the quadratic term drops
to n^1.5 overall, and since n_super ~ sqrt corpus the per-decade
growth of the assignment term is 10x, matching the data decade.

Also prints the mined-pair count per decade (recall proxy: partial
super descent can drop boundary pairs; the count shows how much).

Usage: python tools/probe_r12_hier.py [flat|hier ...]
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


def _quantizer(spark, sf_dir, mult):
    emb = table(spark, sf_dir, "embeddings")
    n_lists = 8 * mult
    n_super = max(2, int(round(n_lists**0.5)))
    leaves = emb.filter(F.col("vec_id") < n_lists).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    supers = emb.filter(F.col("vec_id") < n_super).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    return emb, leaves, supers


def _build(spark, sf_dir, mult, hier):
    from malstrom_spark.functions.bitext import mine_bitext_ivf
    from malstrom_spark.functions.similarity import assign_leaves_to_supers

    emb, leaves, supers = _quantizer(spark, sf_dir, mult)
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    if not hier:
        return mine_bitext_ivf(a, b, leaves, k=4, n_probe=3, threshold=1.0)
    leaves = assign_leaves_to_supers(leaves, supers).localCheckpoint(eager=True)
    return mine_bitext_ivf(
        a, b, leaves, k=4, n_probe=3, threshold=1.0,
        super_centroids=supers, n_probe_super=3,
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
    spark = build_session(app_name="probe-r12-hier")
    for mode in ["flat", "hier"]:
        if mode not in only:
            continue
        ts = []
        for sf_dir, mult in SCALES:
            t = _min_of_2(lambda d=sf_dir, m=mult: _build(spark, d, m, mode == "hier"))
            # pair count (recall proxy) only on the cheap decades — a
            # third full pipeline run at sf100 would cost as much as
            # the measurement itself
            pairs = (
                _build(spark, sf_dir, mult, mode == "hier").count()
                if mult < 1000 else "-"
            )
            print(f"  bitext_{mode}_scaled_lists @ {sf_dir}: {t:.2f}s "
                  f"({pairs} pairs)", flush=True)
            ts.append(t)
        if len(ts) == 3:
            e1 = math.log(ts[1] / ts[0]) / math.log(100)
            e2 = math.log(ts[2] / ts[1]) / math.log(10)
            print(f"bitext_{mode}_scaled_lists | exp 0.1->10: {e1:.2f} "
                  f"| exp 10->100: {e2:.2f}", flush=True)


if __name__ == "__main__":
    main()
