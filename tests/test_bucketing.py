"""Bucketed co-located join: the one-time write shuffle must buy
exchange-free joins and aggregations afterwards (the 100 TB
repeated-join strategy, operators/bucketing.py)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from malstrom_spark.operators.bucketing import bucketed_join, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue().split("== Initial Plan ==")[0]


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # managed tables land in ./spark-warehouse (static conf, can't be
    # redirected on a live session); dropped at the end
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    write_bucketed(li, "li_bucketed", ["l_orderkey"], n_buckets=8)
    write_bucketed(orders, "ord_bucketed", ["o_orderkey"], n_buckets=8)

    # at sf0.001 the planner would (rightly) broadcast; disable it so
    # the test exercises the sort-merge path big fact-fact joins take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark, "li_bucketed", "ord_bucketed", F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan  # co-located

        # correctness: same result as the plain join
        got = joined.count()
        want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert got == want

        # an aggregation on the bucket key is exchange-free too
        agg = spark.table("li_bucketed").groupBy("l_orderkey").agg(F.sum("l_extendedprice"))
        assert "Exchange hashpartitioning" not in _plan(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_multipass_dedup_stages_join_exchange_free(spark, sf_dir):
    """Round-4 VERDICT #3: pass 1 (dedup) persists its outputs as
    bucketed stage tables; pass 2 (a fresh job: gate + continue the
    corpus build) reads them back and joins corpus-to-labels with
    ZERO Exchange — the cross-job co-located join the in-plan
    localCheckpoint stage tables can't provide."""
    from malstrom_spark.functions import dedup
    from malstrom_spark.operators.bucketing import persist_stage
    from malstrom_spark.queries import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    # ---- pass 1: dedup job writes its stage tables bucketed on doc_id
    labels = dedup.dedup_clusters(docs, "doc_id", threshold=0.5)
    persist_stage(labels, "stage_dedup_labels", ["doc_id"], n_buckets=8)
    persist_stage(docs, "stage_corpus", ["doc_id"], n_buckets=8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # ---- pass 2: separate job reads ONLY the stage tables
        corpus = spark.table("stage_corpus")
        keepers = spark.table("stage_dedup_labels").where(F.col("is_keeper"))
        pass2 = corpus.join(keepers, "doc_id").select("doc_id", "text", "group_id")
        plan = _plan(pass2)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located, not re-shuffled

        # correctness: identical to the unbucketed join
        want = docs.join(
            dedup.dedup_clusters(docs, "doc_id", threshold=0.5).where("is_keeper"),
            "doc_id",
        ).count()
        assert pass2.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS stage_dedup_labels")
        spark.sql("DROP TABLE IF EXISTS stage_corpus")


def test_continuous_aggregate_rollup_exchange_free(spark, sf_dir):
    """Round-5 item #7: the continuous-aggregate composition the
    hypertable docstring promises — job 1 persists hour partials
    bucketed on the series key; job 2 derives hour+day+week from the
    stage table with ZERO raw-data scan and ZERO Exchange (bucketing
    on `keys` satisfies every coarser groupBy(date_trunc(g, bucket),
    keys) clustering)."""
    from malstrom_spark.operators.bucketing import persist_stage
    from malstrom_spark.operators.windows import (
        hypertable_from_partials,
        hypertable_partials,
        hypertable_rollup,
    )
    from malstrom_spark.queries import table

    ev = table(spark, sf_dir, "events")
    aggs = {
        "n": ("count", F.lit(1)),
        "sv": ("sum", F.col("value").cast("decimal(18,6)")),
        "mx": ("max", F.col("value")),
    }
    # ---- job 1: ingest batch -> hour partials, bucketed on event_type
    persist_stage(
        hypertable_partials(ev, "ts", ["event_type"], aggs, grain="hour"),
        "stage_ht_hour", ["event_type"], n_buckets=8,
        sort_cols=["event_type", "bucket"],
    )
    try:
        # ---- job 2: reads ONLY the stage table
        out = hypertable_from_partials(
            spark.table("stage_ht_hour"), ["event_type"], aggs,
            grains=("hour", "day", "week"),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "events.parquet" not in plan  # no raw-data scan

        direct = hypertable_rollup(
            ev, "ts", ["event_type"], aggs, grains=("hour", "day", "week")
        )
        sym = (
            out.exceptAll(direct.select(out.columns)).count()
            + direct.select(out.columns).exceptAll(out).count()
        )
        assert sym == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS stage_ht_hour")
