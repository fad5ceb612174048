"""Streaming tests: stateful op parity with batch, and the
checkpoint-recovery story (reference snapshot/recovery semantics,
SURVEY §3.3 — run, stop mid-stream, restart, assert exactly-once
state; mirrors sources/stateful.rs:418-467)."""

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from malstrom_spark.streaming.replay import run_to_memory
from malstrom_spark.streaming.stateful import running_totals_stream


@pytest.fixture(scope="module")
def events_dir(spark):
    """Two parquet files so maxFilesPerTrigger=1 yields two batches."""
    d = tempfile.mkdtemp(prefix="mstream_")
    rows1 = [(i, i % 3, float(i)) for i in range(30)]
    rows2 = [(i, i % 3, float(i)) for i in range(30, 60)]
    spark.createDataFrame(rows1, "event_id long, user_id long, value double").coalesce(
        1
    ).write.mode("overwrite").parquet(d + "/f1")
    spark.createDataFrame(rows2, "event_id long, user_id long, value double").coalesce(
        1
    ).write.mode("append").parquet(d + "/f1")
    yield d + "/f1"
    shutil.rmtree(d, ignore_errors=True)


def _read_stream(spark, path, max_files=None):
    schema = "event_id long, user_id long, value double"
    r = spark.readStream.format("parquet").schema(schema)
    if max_files:
        r = r.option("maxFilesPerTrigger", str(max_files))
    return r.load(path)


def test_stateful_stream_matches_batch(spark, events_dir):
    sdf = _read_stream(spark, events_dir)
    out = run_to_memory(running_totals_stream(sdf), output_mode="append")
    got = {r.user_id: (r.n_events, r.total_value) for r in out.collect()}
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    )
    expect = {r.user_id: (r.n, r.t) for r in batch}
    assert got == expect


def test_checkpoint_recovery_exactly_once(spark, events_dir):
    """Stop after the first microbatch, restart from the checkpoint:
    state must resume (not restart) and the final totals must equal
    the batch aggregate — exactly-once state (SURVEY §2.9)."""
    ckpt = tempfile.mkdtemp(prefix="mckpt_")
    out_rows = {}

    def sink(batch_df, epoch_id):
        for r in batch_df.collect():
            out_rows[(epoch_id, r.user_id)] = (r.n_events, r.total_value)

    # phase 1: one file per trigger, stop after first batch
    sdf = _read_stream(spark, events_dir, max_files=1)
    q = (
        running_totals_stream(sdf)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    totals_after_phase1 = dict(out_rows)

    # phase 2: restart from the same checkpoint; offsets + state resume
    sdf2 = _read_stream(spark, events_dir, max_files=1)
    q2 = (
        running_totals_stream(sdf2)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    # last emission per user must equal the full batch aggregate
    final = {}
    for (epoch, uid), v in out_rows.items():
        if (uid not in final) or (epoch >= final[uid][0]):
            final[uid] = (epoch, v)
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    )
    expect = {r.user_id: (r.n, r.t) for r in batch}
    got = {uid: v for uid, (_, v) in final.items()}
    assert got == expect
    assert totals_after_phase1 != {}  # phase 1 really emitted something
    shutil.rmtree(ckpt, ignore_errors=True)


def test_windowed_stream_counts(spark):
    import pandas as pd

    rows = [(i, f"2024-01-01 0{i % 3}:15:00", "t") for i in range(9)]
    df = spark.createDataFrame(rows, "id long, ts_s string, k string").withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    d = tempfile.mkdtemp(prefix="mwin_")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    sdf = (
        spark.readStream.format("parquet")
        .schema(df.schema)
        .load(d)
        .withWatermark("ts", "1 hour")
    )
    agg = sdf.groupBy(F.window("ts", "1 hour"), "k").agg(F.count(F.lit(1)).alias("n"))
    out = run_to_memory(agg, output_mode="complete")
    got = sorted(r.n for r in out.collect())
    assert got == [3, 3, 3]
    shutil.rmtree(d, ignore_errors=True)
