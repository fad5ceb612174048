"""Tokenizer as TWO jobs — the production shape: job 1 fits BPE over
the corpus and persists the merge table; job 2 (a different pipeline,
possibly weeks later, possibly on different data) loads that table
and encodes with it. The persisted (rank, left, right) parquet is the
single source of truth, so every consumer tokenizes IDENTICALLY —
token budgets (pack_sequences, chunk_text) computed in one job mean
the same thing in the next. persist_stage discipline, same as the
dedup history store (examples/incremental_dedup.py) and the IVF
serving tables (examples/ann_serving.py).

No reference analog (LLM-pipeline layer; the reference has no
tokenizer — its surface is general closures, SURVEY §2.8)."""

from pyspark.sql import functions as F

from malstrom_spark.functions import bpe


def main(spark):
    import os

    sfx = f"_{os.getpid()}"  # run-unique: concurrent sessions share
    # the warehouse, fixed table names would collide
    corpus = spark.createDataFrame(
        [(i, "the lower the newest lowest wider new news "
             "low lower lowest " * (1 + i % 3))
         for i in range(40)],
        "doc_id long, text string",
    )

    # ---- job 1: fit + persist --------------------------------------
    merges = bpe.bpe_fit(corpus, "text", n_merges=60)
    bpe.bpe_save(spark, merges, "bpe_merges_example" + sfx)

    # ---- job 2: load + encode (no refit, no hand-carried list) -----
    loaded = bpe.bpe_load(spark, "bpe_merges_example" + sfx)
    assert loaded == merges, "persisted merge list must round-trip exactly"

    enc = bpe.bpe_encode(corpus, "text", loaded)
    twin = bpe.bpe_encode(corpus, "text", merges, out_col="bpe_twin")
    both = enc.join(twin.select("doc_id", "bpe_twin"), "doc_id")
    n_diff = both.where(
        F.col("bpe_tokens") != F.col("bpe_twin")
    ).count()
    assert n_diff == 0, "loaded merges must encode identically"

    n_tokens = enc.select(
        F.sum(F.size("bpe_tokens")).alias("n")).collect()[0]["n"]

    # corrupted table fails loudly instead of tokenizing differently
    spark.sql(f"DROP TABLE IF EXISTS bpe_merges_bad_version{sfx}")
    spark.createDataFrame(
        [(1, "a", "b", 999)],
        "rank int, left string, right string, format_version int",
    ).write.mode("overwrite").format("parquet").saveAsTable(
        "bpe_merges_bad_version" + sfx)
    try:
        bpe.bpe_load(spark, "bpe_merges_bad_version" + sfx)
        raise AssertionError("version check did not fire")
    except ValueError:
        pass

    spark.sql(f"DROP TABLE IF EXISTS bpe_merges_example{sfx}")
    spark.sql(f"DROP TABLE IF EXISTS bpe_merges_bad_version{sfx}")
    return {
        "n_merges": len(merges),
        "roundtrip_exact": True,
        "total_tokens": int(n_tokens),
    }
