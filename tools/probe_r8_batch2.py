"""sf0.1 -> sf10 (100x) scale probes for the round-8 batch-2
operators (BASELINE.md round-8 table). Methodology as prior rounds:
honest keyed replica (tools/make_sf_replica.py), warm min-of-2, solo.

fuzzy linkage note: the stock replica COPIES c_name per replica, so
name-match density (the OUTPUT) would grow quadratically by
construction — that measures the data, not the operator. The probe
regenerates names from the offset surrogate keys
('customer#%09d' % c_custkey — names follow keys, the way entity
data actually grows) and thins with custkey % 50 so both scales run
the identical statement shape.

Usage: python tools/probe_r8_batch2.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from malstrom_spark.session import build_session  # noqa: E402
from malstrom_spark.queries import full_registry, table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF10 = "/tmp/testdata/sf10"


def fuzzy_regen(spark, sf_dir):
    from malstrom_spark.functions import linkage

    cust = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 50 == 0)
        .select(
            F.col("c_custkey").alias("id"),
            F.format_string("customer#%09d", F.col("c_custkey")).alias("nm"),
        )
    )
    return linkage.fuzzy_self_pairs(cust, "id", "nm", max_distance=2)


def registry_probe(name):
    fr = full_registry()

    def run(spark, sf_dir):
        return fr[name].fn(spark, sf_dir)

    return run


PROBES = {
    "customer_fuzzy_pairs_regen": fuzzy_regen,
    "doc_decontaminate_bloom": registry_probe("doc_decontaminate_bloom"),
    "doc_bm25_search": registry_probe("doc_bm25_search"),
    "doc_inverted_postings": registry_probe("doc_inverted_postings"),
    "customer_pagerank": registry_probe("customer_pagerank"),
    "orders_cdc_snapshot": registry_probe("orders_cdc_snapshot"),
    "streaming_cdc_snapshot": registry_probe("streaming_cdc_snapshot"),
    "corpus_lang_temperature_sample": registry_probe("corpus_lang_temperature_sample"),
    "events_zorder_key": registry_probe("events_zorder_key"),
}


def main():
    only = set(sys.argv[1:])
    spark = build_session(app_name="probe-r8b2")
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        line = [name]
        for sf_dir in (SF01, SF10):
            times = []
            n = None
            for _ in range(2):
                t0 = time.time()
                n = fn(spark, sf_dir).count()
                times.append(time.time() - t0)
            line.append(f"{sf_dir.split('/')[-1]}: {min(times):.2f}s n={n}")
        print(" | ".join(line), flush=True)


if __name__ == "__main__":
    main()
