"""Bucketed (pre-shuffled) tables for co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle.
Bucketing pays that shuffle ONCE at write time: both tables are
hash-partitioned into the same number of buckets on the join key and
sorted within buckets, so every subsequent join or aggregation on
that key runs with ZERO exchange (SortMergeJoin reads co-located
buckets directly). This is the batch analog of the reference keeping
keyed state resident on its owning worker (key_distribute,
keyed/key_distribute.rs:21-45) — ownership is established once and
reused across the pipeline.

Usage:
    write_bucketed(li, "li_b", ["l_orderkey"], n_buckets=64)
    write_bucketed(orders, "ord_b", ["o_orderkey"], n_buckets=64)
    joined = bucketed_join(spark, "li_b", "ord_b",
                           F.col("l_orderkey") == F.col("o_orderkey"))
    # joined.explain() shows no Exchange on either side

Rules for the exchange to actually disappear:
- same bucket count on both sides;
- join keys = bucket keys exactly;
- spark.sql.sources.bucketing.enabled (default true) and
  spark.sql.shuffle.partitions >= n_buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 64,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted managed table (parquet). The write
    shuffles on the bucket key — the one-time cost that every
    downstream join/agg on that key then skips."""
    cols = list(bucket_cols)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, cols[0], *cols[1:])
    )
    sort = list(sort_cols) if sort_cols else cols
    writer = writer.sortBy(sort[0], *sort[1:])
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Column,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the
    plan contains no Exchange (verify: tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def persist_stage(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 64,
    sort_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Materialize a pipeline stage as a bucketed stage table and
    return it re-read — the CROSS-JOB analog of the in-plan
    localCheckpoint stage tables the dedup pipelines use within one
    plan. A 100 TB corpus build runs dedup -> decontaminate -> pack as
    SEPARATE jobs; persisting each pass's narrow outputs (cluster
    labels, hash-set tables, keeper id sets) bucketed on the document
    id means every later pass joins them against the (same-bucketed)
    corpus with zero Exchange — the join shuffle is paid once, at this
    write. Spirit of the reference's persisted snapshot state reused
    across runs (snapshot/mod.rs:27-46): ownership of a key's data is
    established once and respected by every subsequent consumer.

    Plan-asserted in tests/test_bucketing.py::
    test_multipass_dedup_stages_join_exchange_free."""
    write_bucketed(df, table_name, bucket_cols, n_buckets, sort_cols)
    return df.sparkSession.table(table_name)
