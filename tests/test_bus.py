"""Jar-free Kafka-contract twin (sources/bus.py): round-trip, keyed
partition routing, checkpoint recovery (the reference's proof,
malstrom-kafka/src/source.rs:173-215), async group-offset commits
(source.rs:96-109), and idempotent epoch-replay on the producer."""

import json
import os

import pytest
from pyspark.sql import functions as F

from malstrom_spark.sources.bus import (
    bus_produce,
    bus_sink,
    committed_offsets,
    register_message_bus_source,
)


def _msgs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("k"), (F.col("id") % 3)).alias("key"),
        F.concat(F.lit("v"), F.col("id")).alias("value"),
    )


def _read_all(spark, bus, topic, checkpoint, name):
    register_message_bus_source(spark)
    sdf = (
        spark.readStream.format("malstrom_bus")
        .option("path", bus)
        .option("topic", topic)
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    return spark.sql(f"select * from {name}")


def test_bus_round_trip_and_routing(spark, tmp_path):
    bus = str(tmp_path / "bus")
    bus_produce(_msgs(spark, 0, 30), bus, "events", epoch_id=0)
    out = _read_all(spark, bus, "events", str(tmp_path / "ck"), "bus_rt").collect()
    assert sorted(r.value for r in out) == sorted(f"v{i}" for i in range(30))
    # keyed routing: one partition per key, offsets contiguous from 0
    parts_by_key = {}
    for r in out:
        parts_by_key.setdefault(r.key, set()).add(r.partition)
    assert all(len(ps) == 1 for ps in parts_by_key.values())
    by_part = {}
    for r in out:
        by_part.setdefault(r.partition, []).append(r.offset)
    for offs in by_part.values():
        assert sorted(offs) == list(range(len(offs)))


def _drain_to_parquet(spark, bus, topic, checkpoint, outdir):
    """Consume everything available into a parquet sink (supports
    checkpoint recovery, unlike the memory sink) and stop."""
    register_message_bus_source(spark)
    sdf = (
        spark.readStream.format("malstrom_bus")
        .option("path", bus)
        .option("topic", topic)
        .load()
    )
    q = (
        sdf.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(outdir)


def test_bus_restart_resumes_from_checkpoint(spark, tmp_path):
    """The reference's recovery proof (source.rs:173-215): consume,
    stop, produce more, restart from the same checkpoint — every
    message seen exactly once, no replay, no loss."""
    bus, ck, out = str(tmp_path / "bus"), str(tmp_path / "ck"), str(tmp_path / "out")
    bus_produce(_msgs(spark, 0, 20), bus, "t", epoch_id=0)
    first = _drain_to_parquet(spark, bus, "t", ck, out).collect()
    assert sorted(r.value for r in first) == sorted(f"v{i}" for i in range(20))
    bus_produce(_msgs(spark, 20, 35), bus, "t", epoch_id=1)
    second = _drain_to_parquet(spark, bus, "t", ck, out).collect()
    # restart resumed from the WAL: 35 rows total, each EXACTLY once
    assert sorted(r.value for r in second) == sorted(f"v{i}" for i in range(35))


def test_bus_async_commit_is_informational(spark, tmp_path):
    """commit(end) publishes group offsets AFTER the WAL write (async
    ack twin); recovery must use the WAL, not the commit file — proven
    by tampering the commit file backwards and restarting."""
    bus, ck, out = str(tmp_path / "bus"), str(tmp_path / "ck"), str(tmp_path / "out")
    bus_produce(_msgs(spark, 0, 12), bus, "t2", epoch_id=0, n_partitions=2)
    _drain_to_parquet(spark, bus, "t2", ck, out)
    # ASYNC semantics, exactly the reference's commit-on-snapshot lag:
    # batch 0's group offsets publish when the NEXT batch is planned,
    # not inline with processing (source.rs:96-109)
    assert committed_offsets(bus, "t2") is None
    bus_produce(_msgs(spark, 12, 15), bus, "t2", epoch_id=1, n_partitions=2)
    _drain_to_parquet(spark, bus, "t2", ck, out)
    committed = committed_offsets(bus, "t2")
    assert committed is not None and sum(map(int, committed.values())) >= 12
    # tamper: pretend the group only ever committed offset 0
    cpath = os.path.join(bus, "t2", "__commits", "default.json")
    with open(cpath, "w", encoding="utf-8") as fh:
        json.dump({p: 0 for p in committed}, fh)
    bus_produce(_msgs(spark, 15, 18), bus, "t2", epoch_id=2, n_partitions=2)
    rows = _drain_to_parquet(spark, bus, "t2", ck, out).collect()
    # WAL wins: 18 rows exactly once, not a replay of the first 15
    assert sorted(r.value for r in rows) == sorted(f"v{i}" for i in range(18))


def test_bus_producer_epoch_replay_idempotent(spark, tmp_path):
    """Same epoch id written twice = same segment overwritten once —
    the exactly-once producer property foreachBatch replays rely on."""
    bus = str(tmp_path / "bus")
    df = _msgs(spark, 0, 10)
    bus_produce(df, bus, "t3", epoch_id=7)
    bus_produce(df, bus, "t3", epoch_id=7)  # replay
    out = _read_all(spark, bus, "t3", str(tmp_path / "ck"), "bus_i").collect()
    assert sorted(r.value for r in out) == sorted(f"v{i}" for i in range(10))


def test_bus_streaming_sink_round_trip(spark, tmp_path):
    """bus_sink as the streaming producer: rate-limited file replay ->
    bus topic -> read back; counts match exactly."""
    src_bus, dst_bus = str(tmp_path / "src"), str(tmp_path / "dst")
    bus_produce(_msgs(spark, 0, 25), src_bus, "in", epoch_id=0)
    register_message_bus_source(spark)
    sdf = (
        spark.readStream.format("malstrom_bus")
        .option("path", src_bus)
        .option("topic", "in")
        .load()
        .select("key", "value")
    )
    q = bus_sink(
        sdf, dst_bus, "out", str(tmp_path / "ck1"), trigger_available_now=True
    )
    q.awaitTermination()
    out = _read_all(spark, dst_bus, "out", str(tmp_path / "ck2"), "bus_s").collect()
    assert sorted(r.value for r in out) == sorted(f"v{i}" for i in range(25))


def test_bus_concurrent_producers_never_collide(spark, tmp_path):
    """Two producers using the SAME epoch ids on one topic write
    disjoint segments (producer-id namespace, Kafka's producer-id
    field); consumers see every message exactly once."""
    bus = str(tmp_path / "bus")
    bus_produce(_msgs(spark, 0, 10), bus, "t4", epoch_id=0, producer_id="pa")
    bus_produce(_msgs(spark, 10, 20), bus, "t4", epoch_id=0, producer_id="pb")
    out = _read_all(spark, bus, "t4", str(tmp_path / "ck"), "bus_mp").collect()
    assert sorted(r.value for r in out) == sorted(f"v{i}" for i in range(20))
