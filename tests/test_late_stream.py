"""Streaming late-data side output (SURVEY §4.3.1): the reference
diverts records at/below the current epoch to a late stream
(generate_epochs.rs:44,124-126); Spark drops them. flag_late_stream
reproduces the side output; this test drives it file-by-file
(maxFilesPerTrigger=1) so the frontier advances batch-by-batch
deterministically, then checks the flag against the reference rule.
"""

import pathlib

from pyspark.sql import functions as F


def _write_batch(spark, dirpath: pathlib.Path, idx: int, rows):
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    df.coalesce(1).write.parquet(str(dirpath / f"b{idx}"))


def test_flag_late_stream_matches_reference_rule(spark, tmp_path):
    from datetime import datetime, timezone

    from malstrom_spark.streaming.eventtime import flag_late_stream

    t = lambda s: datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)  # noqa: E731

    staging = tmp_path / "in"
    staging.mkdir()
    # batch 0: ts 100..109 -> frontier 109, nothing can be late yet
    _write_batch(spark, staging, 0, [(i, t(100 + i)) for i in range(10)])
    # batch 1: 50 is late (50 <= 109-10); 110..115 on time -> frontier 115
    _write_batch(spark, staging, 1, [(100, t(50))] + [(110 + i, t(110 + i)) for i in range(6)])
    # batch 2: 95 late (95 <= 115-10); 120 on time
    _write_batch(spark, staging, 2, [(200, t(95)), (201, t(120))])

    schema = "event_id long, ts timestamp"
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(staging) + "/b*")
    )
    # single shard: the test needs one global frontier to be deterministic
    flagged = flag_late_stream(sdf, "ts", delay_sec=10, n_shards=1)
    q = (
        flagged.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.event_id: r.is_late for r in spark.table("late_test").collect()}

    assert len(got) == 19  # nothing dropped — unlike withWatermark
    assert got[100] is True
    assert got[200] is True
    on_time = [k for k, v in got.items() if not v]
    assert sorted(on_time) == [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 110, 111, 112, 113, 114, 115, 201]


def test_flag_late_stream_batch0_all_on_time(spark, tmp_path):
    """No frontier yet -> nothing is late (reference: no epoch emitted
    before the first record, generate_epochs.rs:73-123)."""
    from datetime import datetime, timezone

    from malstrom_spark.streaming.eventtime import flag_late_stream

    t = lambda s: datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)  # noqa: E731
    staging = tmp_path / "in"
    staging.mkdir()
    _write_batch(spark, staging, 0, [(1, t(1000)), (2, t(5)), (3, t(2000))])

    sdf = spark.readStream.schema("event_id long, ts timestamp").parquet(str(staging) + "/b*")
    flagged = flag_late_stream(sdf, "ts", delay_sec=10, n_shards=1)
    q = (
        flagged.writeStream.format("memory")
        .queryName("late_test_b0")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.event_id: r.is_late for r in spark.table("late_test_b0").collect()}
    assert got == {1: False, 2: False, 3: False}


def test_generate_epochs_closure_invariants(spark, tmp_path):
    """The arbitrary-closure epoch generator must honor the reference
    invariants (assign_timestamps.rs:104-293 / generate_epochs.rs):
    epoch takes effect AFTER the triggering record, None and
    non-monotone closure results are ignored, and a record at or below
    the epoch in force is flagged late."""
    from datetime import datetime, timezone

    from malstrom_spark.streaming.eventtime import generate_epochs

    t = lambda s: datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)  # noqa: E731

    staging = tmp_path / "in"
    staging.mkdir()
    # one batch, one shard -> deterministic in-file record order
    rows = [
        (1, t(100)),  # closure -> 90; record judged before epoch exists
        (2, t(50)),   # 50 <= 90 -> LATE; closure 40 non-monotone -> ignored
        (3, t(200)),  # on time; closure -> 190
        (4, t(190)),  # 190 <= 190 -> LATE (at-or-below rule)
        (5, t(191)),  # on time (just above epoch); closure 181 ignored
    ]
    _write_batch(spark, staging, 0, rows)

    def epoch_fn(row, prev):
        # epoch trails each record's ts by 10s (like bounded disorder,
        # but an arbitrary user closure)
        return int(row["ts"].timestamp() * 1_000_000) - 10_000_000

    sdf = spark.readStream.schema("event_id long, ts timestamp").option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(staging) + "/b*")
    out = generate_epochs(sdf, "ts", epoch_fn, n_shards=1)
    q = (
        out.writeStream.format("memory")
        .queryName("gen_epochs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.event_id: (r.epoch, r.is_late) for r in spark.table("gen_epochs").collect()}
    US = 1_000_000
    assert got[1] == (90 * US, False)   # no epoch in force when judged
    assert got[2] == (90 * US, True)    # late; non-monotone 40 ignored
    assert got[3] == (190 * US, False)  # epoch advanced after record
    assert got[4] == (190 * US, True)   # ts == epoch -> late
    assert got[5] == (190 * US, False)  # 181 non-monotone -> ignored


def test_late_twins_record_level_parity(spark, tmp_path):
    """ADVICE r3 closure lock: with matching shard_cols/n_shards and
    one record per microbatch (the granularity where the streaming
    frontier advances per record, like the batch window), split_late
    and flag_late_stream produce IDENTICAL verdicts record for
    record."""
    from datetime import datetime, timezone

    from malstrom_spark.operators.eventtime import split_late
    from malstrom_spark.streaming.eventtime import flag_late_stream
    from malstrom_spark.testing import OperatorTester

    ts_seconds = [50, 10, 60, 5, 55, 300, 20, 299, 61, 1]
    delay = 30
    rows = [
        (i, datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None))
        for i, s in enumerate(ts_seconds)
    ]

    bdf = spark.createDataFrame(rows, "arrival long, ts timestamp")
    _, late = split_late(
        bdf, "ts", f"INTERVAL {delay} SECONDS", ["arrival"],
        n_shards=2, shard_cols=["arrival"],
    )
    batch_late = {r.arrival for r in late.collect()}

    t = OperatorTester(
        spark,
        "arrival long, ts timestamp",
        op=lambda sdf: flag_late_stream(
            sdf, "ts", delay_sec=delay, n_shards=2, shard_cols=["arrival"]
        ),
        work_dir=str(tmp_path / "twin"),
    )
    try:
        for row in rows:  # one record per microbatch = per-record frontier
            t.send([row])
        out = t.step()
        stream_late = {r.arrival for b in out for r in b if r.is_late}
    finally:
        t.stop()
    assert stream_late == batch_late and len(batch_late) > 0
