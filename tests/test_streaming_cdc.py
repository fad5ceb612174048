"""Streaming CDC apply (streaming/cdc.py): cross-batch state
survival and batching-invariance of the compacted snapshot."""

import pytest

from malstrom_spark.operators.cdc import cdc_compact
from malstrom_spark.streaming.cdc import cdc_snapshot_stream
from malstrom_spark.streaming.replay import run_to_memory


SCHEMA = "k string, op string, ts long, seq int, val string"

BATCH1 = [
    ("a", "I", 1, 1, "a1"),
    ("b", "I", 1, 1, "b1"),
    ("c", "I", 1, 1, "c1"),
]
BATCH2 = [
    ("a", "U", 2, 1, "a2"),      # update overrides batch-1 state
    ("b", "D", 2, 1, None),      # delete lands in a later batch
    ("d", "I", 2, 1, "d1"),      # new key appears late
    ("c", "U", 1, 0, "stale"),   # LOWER (ts, seq) than state: ignored
]


def _run(spark, tmp_path, batches, max_files=1):
    d = tmp_path / "cdc_log"
    d.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(d / f"b{i}"))
    sdf = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", str(max_files))
        .load(str(d / "b*"))
    )
    emitted = run_to_memory(
        cdc_snapshot_stream(sdf, "k", ts_col="ts", seq_col="seq"),
        output_mode="append",
    )
    snap = cdc_compact(emitted, "k", "ts", tiebreak="seq")
    return {r["k"]: r["val"] for r in snap.collect()}


def test_multibatch_state_survival(spark, tmp_path):
    got = _run(spark, tmp_path, [BATCH1, BATCH2], max_files=1)
    assert got == {"a": "a2", "c": "c1", "d": "d1"}  # b deleted, stale ignored


def test_batching_invariance(spark, tmp_path):
    """One batch or many: the compacted snapshot is identical."""
    one = _run(spark, tmp_path, [BATCH1 + BATCH2], max_files=10)
    assert one == {"a": "a2", "c": "c1", "d": "d1"}


def test_missing_columns_raise(spark):
    df = spark.createDataFrame([("a", 1)], "k string, ts long")
    sdf = df  # schema check happens before any streaming machinery
    with pytest.raises(ValueError, match="seq"):
        cdc_snapshot_stream(sdf, "k", ts_col="ts", seq_col="seq")
