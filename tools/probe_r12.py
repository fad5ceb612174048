"""Round-12 sf100 two-decade probes for the HEAVY operator families
(VERDICT r11 #3): only 4 flagship queries had second-decade exponents
booked; this measures the expensive families across sf0.1 / sf10 /
sf100 (1000x) so their scaling exponents are measurements too.

- embedding_bitext_ivf: probed through the operator chain with
  n_lists scaled with the corpus (8 -> 800 -> 8000) so mean cell size
  stays constant — the r11 sf10 discipline extended a decade.
- doc_exact_substring_dedup, dedup_containment,
  customer_entity_groups: registry rows run directly on the replica
  dirs (their internal caps/knobs are corpus-relative already).

Methodology: honest keyed replica (tools/make_sf_replica.py), warm
min-of-2, noop-write materialization, solo.
Exponent = log(t_big/t_small)/log(scale).

Usage: python tools/probe_r12.py [probe ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from malstrom_spark.queries import full_registry, table  # noqa: E402
from malstrom_spark.session import build_session  # noqa: E402

SCALES = [
    ("/root/testdata/sf0.1", 1),
    ("/tmp/testdata/sf10", 100),
    ("/tmp/testdata/sf100", 1000),
]

DIRECT = [
    "doc_exact_substring_dedup",
    "dedup_containment",
    "customer_entity_groups",
]

#: above this, the second warm run of a decade is skipped (booked as
#: min-of-1): the exponent reading doesn't justify another half hour
SECOND_RUN_CAP_SEC = 1200.0


def _bitext_ivf(spark, sf_dir, mult):
    # same builder as tools/probe_r11.py, third decade added
    from malstrom_spark.functions.bitext import mine_bitext_ivf

    emb = table(spark, sf_dir, "embeddings")
    n_lists = 8 * mult  # constant mean cell size across the scale-up
    cents = emb.filter(F.col("vec_id") < n_lists).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    return mine_bitext_ivf(a, b, cents, k=4, n_probe=3, threshold=1.0)


CUSTOM = {"bitext_ivf_scaled_lists": _bitext_ivf}


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


def _report(name, ts):
    e1 = math.log(ts[1] / ts[0]) / math.log(100)
    e2 = math.log(ts[2] / ts[1]) / math.log(10)
    print(
        f"{name} | sf0.1: {ts[0]:.2f}s | sf10: {ts[1]:.2f}s "
        f"| sf100: {ts[2]:.2f}s | exp 0.1->10: {e1:.2f} "
        f"| exp 10->100: {e2:.2f}",
        flush=True,
    )


def main():
    only = set(sys.argv[1:])
    spark = build_session(app_name="probe-r12")
    fr = full_registry()
    for name in DIRECT:
        if only and name not in only:
            continue
        ts = []
        for sf_dir, _ in SCALES:
            t = _min_of_2(lambda n=name, d=sf_dir: fr[n].fn(spark, d))
            print(f"  {name} @ {sf_dir}: {t:.2f}s", flush=True)
            ts.append(t)
        _report(name, ts)
    for name, fn in CUSTOM.items():
        if only and name not in only:
            continue
        ts = []
        for sf_dir, mult in SCALES:
            t = _min_of_2(lambda f=fn, d=sf_dir, m=mult: f(spark, d, m))
            print(f"  {name} @ {sf_dir}: {t:.2f}s", flush=True)
            ts.append(t)
        _report(name, ts)


if __name__ == "__main__":
    main()
