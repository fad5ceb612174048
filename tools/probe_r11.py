"""Round-11 scale probes (BASELINE.md round-11 table).

Two parts:

1. sf0.1 -> sf10 (100x) probes for every round-11 operator, same
   methodology as prior rounds: honest keyed replica
   (tools/make_sf_replica.py), warm min-of-2, noop-write
   materialization, solo.

   Rows that need a scaling knob probe through the operator chain
   with the knob scaled honestly:
   - embedding_bitext_ivf: n_lists scales with the corpus (8 -> 800)
     so mean CELL size stays constant — fixed cells at 100x data
     would grow per-cell candidate pairs quadratically by
     construction (the semdedup-k discipline).
   - crawl_recrawl_schedule: the gate form caps entries at
     doc_id < 300; the probe lifts the cap 100x.

2. sf100 (1000x sf0.1) for the FLAGSHIP path (VERDICT r10 #6):
   training_data_pipeline_scale + dedup_minhash_lsh_scale, plus the
   q1 relational flagship and the lang-ID hot path — measured at
   sf0.1 / sf10 / sf100 so the scaling EXPONENT
   (log(t_big/t_small) / log(n_big/n_small)) is a measurement, not
   an extrapolation from one decade.

Usage: python tools/probe_r11.py [sf10|sf100] [probe ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from malstrom_spark.queries import full_registry, table  # noqa: E402
from malstrom_spark.session import build_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF10 = "/tmp/testdata/sf10"
SF100 = "/tmp/testdata/sf100"

DIRECT_SF10 = [
    "doc_exact_substring_dedup",
    "doc_host_reputation",
    "doc_unigram_tokens",
    "image_phash_index_updated",
    "doc_phrase_search",
    "doc_decontaminate_fuzzy",
    "corpus_mixture_plan",
    "doc_tokenizer_fertility",
]

FLAGSHIP_SF100 = [
    "q1_pricing_summary",
    "doc_lang_id_arrow",
    "dedup_minhash_lsh_scale",
    "training_data_pipeline_scale",
]


def _bitext_ivf(spark, sf_dir, mult):
    from malstrom_spark.functions.bitext import mine_bitext_ivf

    emb = table(spark, sf_dir, "embeddings")
    n_lists = 8 * mult  # constant mean cell size across the scale-up
    cents = emb.filter(F.col("vec_id") < n_lists).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    # probes the Column (HOF) form: at sf10 the Arrow pair-scorer
    # twin ships every candidate pair's two vectors through Arrow
    # (227 s vs 179 s here) — JVM-side scoring wins once transfer
    # dominates; the Arrow twin's bench win holds at sf0.1 only for
    # the EXACT kernel, whose transfer is one broadcast + corpus scan
    return mine_bitext_ivf(a, b, cents, k=4, n_probe=3, threshold=1.0)


def _recrawl(spark, sf_dir, mult):
    from malstrom_spark.functions.crawl import recrawl_schedule

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300 * mult
    )
    url = F.concat(
        F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example/p"), F.col("doc_id").cast("string"),
    )
    cf = F.element_at(
        F.array(
            F.lit("daily"), F.lit("weekly"), F.lit("monthly"),
            F.lit("never"), F.lit("always"), F.lit(None).cast("string"),
        ),
        ((F.col("doc_id") % 6) + 1).cast("int"),
    )
    entries = d.select(
        url.alias("url"),
        F.concat(
            F.lit("2026-01-"),
            F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        ).alias("lastmod"),
        cf.alias("changefreq"),
    )
    history = d.where(F.col("doc_id") % 3 != 0).select(
        url.alias("url"),
        F.to_date(
            F.concat(
                F.lit("2026-01-"),
                F.lpad((F.col("doc_id") % 20 + 1).cast("string"), 2, "0"),
            )
        ).alias("last_fetch"),
    )
    return recrawl_schedule(entries, history, as_of="2026-02-10")


CUSTOM_SF10 = {
    "bitext_ivf_scaled_lists": _bitext_ivf,
    "recrawl_uncapped": _recrawl,
}


def _min_of_2(build):
    times = []
    for _ in range(2):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    return min(times)


def probe_sf10(spark, only):
    fr = full_registry()
    for name in DIRECT_SF10:
        if only and name not in only:
            continue
        t1 = _min_of_2(lambda n=name: fr[n].fn(spark, SF01))
        t2 = _min_of_2(lambda n=name: fr[n].fn(spark, SF10))
        print(f"{name} | sf0.1: {t1:.2f}s | sf10: {t2:.2f}s "
              f"| 100x wall: {t2 / t1:.1f}x", flush=True)
    for name, fn in CUSTOM_SF10.items():
        if only and name not in only:
            continue
        t1 = _min_of_2(lambda f=fn: f(spark, SF01, 1))
        t2 = _min_of_2(lambda f=fn: f(spark, SF10, 100))
        print(f"{name} | sf0.1: {t1:.2f}s | sf10: {t2:.2f}s "
              f"| 100x wall: {t2 / t1:.1f}x", flush=True)


def probe_sf100(spark, only):
    fr = full_registry()
    for name in FLAGSHIP_SF100:
        if only and name not in only:
            continue
        ts = []
        for sf_dir in (SF01, SF10, SF100):
            ts.append(_min_of_2(lambda n=name, d=sf_dir: fr[n].fn(spark, d)))
        e1 = math.log(ts[1] / ts[0]) / math.log(100)
        e2 = math.log(ts[2] / ts[1]) / math.log(10)
        print(
            f"{name} | sf0.1: {ts[0]:.2f}s | sf10: {ts[1]:.2f}s "
            f"| sf100: {ts[2]:.2f}s | exp 0.1->10: {e1:.2f} "
            f"| exp 10->100: {e2:.2f}",
            flush=True,
        )


def main():
    args = sys.argv[1:]
    mode = args[0] if args and args[0] in ("sf10", "sf100") else "both"
    only = set(args[1:] if mode != "both" else args)
    spark = build_session(app_name="probe-r11")
    if mode in ("sf10", "both"):
        probe_sf10(spark, only)
    if mode in ("sf100", "both"):
        probe_sf100(spark, only)


if __name__ == "__main__":
    main()
