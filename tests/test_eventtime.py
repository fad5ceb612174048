"""Event-time semantics — mirrors the reference's lateness tests
(assign_timestamps.rs:104-293): input (5..10) then (0..5) arriving
late; with the frontier at max-seen, the second half must land in the
late stream."""

import pyspark.sql.functions as F

from malstrom_spark.operators import eventtime


def test_split_late_reference_pattern(spark):
    # arrival order: 5,6,7,8,9 then 0,1,2,3,4 (all late)
    vals = list(range(5, 10)) + list(range(0, 5))
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "arrival long, v long").withColumn(
        "event_ts", F.timestamp_seconds(F.col("v"))
    )
    # n_shards=1 == the reference's single-worker frontier (the
    # sharded distributed case is pinned by the property test)
    on_time, late = eventtime.split_late(
        df, "event_ts", "INTERVAL 0 SECONDS", ["arrival"], n_shards=1
    )
    assert sorted(r.v for r in on_time.collect()) == [5, 6, 7, 8, 9]
    assert sorted(r.v for r in late.collect()) == [0, 1, 2, 3, 4]


def test_split_late_with_allowance(spark):
    # with a 3-second out-of-orderness bound, values >= frontier-3 are on time
    vals = [5, 6, 7, 8, 9, 7, 4, 0]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "arrival long, v long").withColumn(
        "event_ts", F.timestamp_seconds(F.col("v"))
    )
    on_time, late = eventtime.split_late(
        df, "event_ts", "INTERVAL 3 SECONDS", ["arrival"], n_shards=1
    )
    # frontier after 9 is 9; late iff ts <= 9-3=6 -> the 4 and 0 are late, 7 on time
    assert sorted(r.v for r in late.collect()) == [0, 4]
    assert sorted(r.v for r in on_time.collect()) == [5, 6, 7, 7, 8, 9]


def test_as_event_time_adapter(spark):
    df = spark.createDataFrame([(100,)], "offset long")
    out = eventtime.as_event_time(df, "offset", "ts")
    assert out.schema["ts"].dataType.simpleString() == "timestamp"


def test_assign_timestamps(spark):
    df = spark.createDataFrame([(1, 10)], "a long, b long")
    out = eventtime.assign_timestamps(df, F.timestamp_seconds(F.col("b")), "ts")
    assert "ts" in out.columns


def test_limit_out_of_orderness_batch_noop(spark):
    df = spark.createDataFrame([(1,)], "a long").withColumn(
        "ts", F.timestamp_seconds(F.col("a"))
    )
    out = eventtime.limit_out_of_orderness(df, "ts", "10 minutes")
    assert out.count() == 1
