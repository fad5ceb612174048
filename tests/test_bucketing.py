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
