"""CDC end-to-end — a changelog (inserts/updates/deletes with
sequence numbers) applied three ways, all agreeing:

1. batch compaction (operators/cdc.py cdc_compact — one max_by
   aggregate, the "rebuild the table from the full log" path);
2. streaming apply (streaming/cdc.py cdc_snapshot_stream — per-key
   latest image in the state store, the "keep a table continuously
   current" path), replayed in two microbatches;
3. streaming apply RESTARTED from a checkpoint mid-log: the second
   run processes only the remaining file and still lands on the same
   snapshot — state carried the day-1 images across the restart.

The reference models this as per-key overwritten state
(malstrom-core stateful_map.rs); the snapshot-equality assertions
are the exactly-once evidence for the CDC pipeline shape.
"""

import shutil

from malstrom_spark.operators.cdc import cdc_compact
from malstrom_spark.streaming.cdc import cdc_snapshot_stream

SCHEMA = "account string, op string, ts long, seq int, balance double"
DAY1 = [
    ("acme", "I", 1, 1, 100.0),
    ("globex", "I", 1, 1, 250.0),
    ("initech", "I", 2, 1, 10.0),
    ("acme", "U", 3, 1, 125.0),
]
DAY2 = [
    ("globex", "D", 4, 1, None),     # account closed
    ("initech", "U", 4, 1, 55.0),
    ("globex", "I", 5, 1, 1.0),      # re-opened after the delete
    ("hooli", "I", 5, 1, 9000.0),
]
EXPECTED = {"acme": 125.0, "globex": 1.0, "initech": 55.0, "hooli": 9000.0}


def _snapshot(df):
    snap = cdc_compact(df, "account", "ts", tiebreak="seq")
    return {r["account"]: r["balance"] for r in snap.collect()}


def _stream_run(spark, src, ckpt):
    sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(f"{src}/d*")
    )
    out = cdc_snapshot_stream(sdf, "account", ts_col="ts", seq_col="seq")
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{ckpt}_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def main(spark, tmp_dir="/tmp/malstrom_example_cdc"):
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(f"{tmp_dir}/ckpt_out", ignore_errors=True)
    src, ckpt = f"{tmp_dir}/log", f"{tmp_dir}/ckpt"

    full_log = spark.createDataFrame(DAY1 + DAY2, SCHEMA)
    batch_snap = _snapshot(full_log)
    assert batch_snap == EXPECTED, batch_snap

    # streaming: day 1 lands, job runs, day 2 lands, job RESTARTS
    # from the checkpoint and processes only the new file
    spark.createDataFrame(DAY1, SCHEMA).coalesce(1).write.parquet(f"{src}/d1")
    _stream_run(spark, src, ckpt)
    spark.createDataFrame(DAY2, SCHEMA).coalesce(1).write.parquet(f"{src}/d2")
    _stream_run(spark, src, ckpt)

    emitted = spark.read.parquet(f"{ckpt}_out")
    stream_snap = _snapshot(emitted)
    assert stream_snap == EXPECTED, stream_snap

    return {
        "batch_snapshot": batch_snap,
        "stream_snapshot_after_restart": stream_snap,
        "emitted_rows": emitted.count(),
    }
