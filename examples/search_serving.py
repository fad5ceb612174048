"""Search as TWO jobs — the production retrieval shape: job 1 builds
the inverted index over the corpus (plus a daily delta indexed
separately — history is never re-tokenized) and persists postings
bucketed on term; job 2 loads the stores, merges batches by union and
answers BM25 queries OFF THE INDEX, with the query's terms pushed into
the postings scan (PushedFilters) so serving reads only where those
terms live. Correctness anchor: the served answer equals the
full-corpus scan-path bm25_topk byte-for-byte (the registry row
doc_bm25_incremental proves the same identity against the DuckDB
oracle).

persist_stage discipline, same as examples/ann_serving.py (vector
side) and examples/incremental_dedup.py (dedup side). No reference
analog (LLM-pipeline layer)."""

from pyspark.sql import functions as F

from malstrom_spark.functions import search as S
from malstrom_spark.operators.bucketing import persist_stage


def main(spark):
    import os

    sfx = f"_{os.getpid()}"  # unique per run: concurrent sessions share
    # the warehouse, and fixed stage-table names would collide
    corpus = spark.createDataFrame(
        [(i, f"topic{i % 11} shared vocabulary plus "
             f"{'vector stream ' * (i % 3)}signal{i % 5}")
         for i in range(300)],
        "doc_id long, text string",
    )
    history = corpus.where("doc_id % 10 != 0")
    delta = corpus.where("doc_id % 10 = 0")  # today's batch

    # ---- job 1: index + persist (history once, delta daily) --------
    for name, part in (("search_postings_hist" + sfx, history),
                       ("search_postings_delta" + sfx, delta)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        persist_stage(S.inverted_index(part, "doc_id"), name,
                      bucket_cols=["term"], n_buckets=8)
    for name, part in (("search_docstats_hist" + sfx, history),
                       ("search_docstats_delta" + sfx, delta)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        persist_stage(S.doc_stats(part, "doc_id"), name,
                      bucket_cols=["doc_id"], n_buckets=8)

    # ---- job 2: load, merge, serve ---------------------------------
    postings, dstats = S.merge_index(
        [spark.table("search_postings_hist" + sfx),
         spark.table("search_postings_delta" + sfx)],
        [spark.table("search_docstats_hist" + sfx),
         spark.table("search_docstats_delta" + sfx)],
    )
    queries = spark.createDataFrame(
        [(1, "vector stream"), (2, "signal3 topic7")],
        "query_id long, query string",
    )
    served = S.bm25_topk_from_index(postings, dstats, queries, "doc_id", k=5)

    # the query's terms reach the postings scan as pushed filters
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "In(term" in plan, "term pushdown missing from the serving plan"

    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"]) for r in served.collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"])
        for r in S.bm25_topk(corpus, queries, "doc_id", k=5).collect()
    )
    assert got == want, "served index answer != full-corpus scan answer"

    for t in ("search_postings_hist" + sfx, "search_postings_delta" + sfx,
              "search_docstats_hist" + sfx, "search_docstats_delta" + sfx):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return {
        "indexed_docs": 300,
        "queries": 2,
        "served_rows": len(got),
        "matches_scan_path": True,
    }
