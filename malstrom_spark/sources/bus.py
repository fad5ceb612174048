"""Jar-free Kafka-CONTRACT twin: a partitioned, offset-addressed,
file-backed message bus with a Python-DataSource stream reader and a
foreachBatch producer — so the Kafka source/sink semantics the
connector-jar gap leaves unexecuted (tests/test_kafka_gap.py) are
exercised end to end without any jar.

What it mirrors, and where (reference `malstrom-kafka/src`):

- topic -> N partitions, each an ordered log addressed by offset
  (source.rs:48-123). Here: `<bus>/<topic>/p<i>/` holding append-only
  SEGMENT files (one per producer epoch — Kafka's log segments), the
  record offset being the running record count across segments.
- per-partition consumer offsets restored from the SNAPSHOT, not from
  the broker's committed group offsets (source.rs:173-215): the
  stream reader's offset dict lives in Spark's checkpoint WAL; restart
  resumes exactly where the WAL says, replaying and losing nothing.
- ASYNC commit-on-snapshot (source.rs:96-109): `commit(end)` — called
  by Spark after a microbatch's offsets are durably logged — writes
  the consumer-group offsets to `<topic>/__commits/<group>.json`.
  Exactly like Kafka's committed group offsets under Structured
  Streaming, these are informational (monitoring/lag), NEVER the
  recovery source of truth; tests/test_bus.py pins both properties.
- keyed producer partitioning (sink.rs:15-72): records route to
  pmod(xxhash64(key), n_partitions), so one key's records stay in one
  partition, in order. The producer writes each (epoch, partition)'s
  records as ONE segment file via atomic tmp+rename, which makes an
  epoch replay overwrite its own segment byte-for-byte — the
  idempotent-producer upgrade over the real sink's at-least-once.

Scale notes: this twin is a CONTRACT harness, not a broker — offset
discovery counts segment lines (a production variant would use byte
offsets + file stat). The real `kafka_stream`/`kafka_sink` stay the
deployment path and auto-activate when a connector jar exists.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BUS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("value", StringType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
    ]
)


def _partition_dirs(bus: str, topic: str) -> list[str]:
    tdir = os.path.join(bus, topic)
    if not os.path.isdir(tdir):
        return []
    return sorted(
        os.path.join(tdir, d) for d in os.listdir(tdir) if d.startswith("p")
    )


def _segments(pdir: str) -> list[str]:
    return sorted(
        os.path.join(pdir, f) for f in os.listdir(pdir) if f.endswith(".jsonl")
    )


class _BusRange(InputPartition):
    def __init__(self, pdir: str, topic: str, pidx: int, start: int, end: int):
        self.pdir = pdir
        self.topic = topic
        self.pidx = pidx
        self.start = start
        self.end = end


class MessageBusStreamReader(DataSourceStreamReader):
    """Offset dict = {partition_index_str: records_consumed}; persisted
    in the checkpoint WAL (the reference's snapshot state,
    source.rs:173-215)."""

    def __init__(self, options):
        self._bus = options.get("path")
        self._topic = options.get("topic")
        self._group = options.get("group", "default")
        if not self._bus or not self._topic:
            raise ValueError("options 'path' and 'topic' are required")

    def _counts(self) -> dict[str, int]:
        out = {}
        for pdir in _partition_dirs(self._bus, self._topic):
            n = 0
            for seg in _segments(pdir):
                with open(seg, "rb") as fh:
                    n += sum(1 for _ in fh)
            out[os.path.basename(pdir)[1:]] = n
        return out

    def initialOffset(self) -> dict:
        return {p: 0 for p in self._counts()}

    def latestOffset(self) -> dict:
        return self._counts()

    def partitions(self, start: dict, end: dict):
        parts = []
        tdir = os.path.join(self._bus, self._topic)
        for p, n in end.items():
            lo = start.get(p, 0)
            if n > lo:
                parts.append(
                    _BusRange(os.path.join(tdir, f"p{p}"), self._topic, int(p), lo, n)
                )
        return parts or [_BusRange("", self._topic, -1, 0, 0)]

    def read(self, partition: _BusRange):
        if not partition.pdir:
            return
        pos = 0
        for seg in _segments(partition.pdir):
            if pos >= partition.end:
                break
            with open(seg, encoding="utf-8") as fh:
                for line in fh:
                    if pos >= partition.end:
                        break
                    if pos >= partition.start:
                        rec = json.loads(line)
                        yield (
                            rec.get("k"),
                            rec.get("v"),
                            partition.topic,
                            partition.pidx,
                            pos,
                        )
                    pos += 1

    def commit(self, end: dict) -> None:
        # the reference commits consumed offsets to the broker ASYNC
        # after each snapshot (source.rs:96-109); Spark calls this
        # after the microbatch's offsets hit the WAL. Informational
        # only — recovery reads the WAL, never this file.
        cdir = os.path.join(self._bus, self._topic, "__commits")
        os.makedirs(cdir, exist_ok=True)
        tmp = os.path.join(cdir, f".{self._group}.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(end, fh)
        os.replace(tmp, os.path.join(cdir, f"{self._group}.json"))


class MessageBusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "malstrom_bus"

    def schema(self):
        return BUS_SCHEMA

    def streamReader(self, schema):
        return MessageBusStreamReader(self.options)


def register_message_bus_source(spark) -> str:
    """Register; read with spark.readStream.format('malstrom_bus')
    .option('path', bus_dir).option('topic', t).load()."""
    spark.dataSource.register(MessageBusDataSource)
    return MessageBusDataSource.name()


def committed_offsets(bus: str, topic: str, group: str = "default") -> dict | None:
    """Read the consumer group's async-committed offsets (lag
    monitoring twin of Kafka's committed group offsets)."""
    path = os.path.join(bus, topic, "__commits", f"{group}.json")
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


def _write_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    bus: str,
    topic: str,
    n_partitions: int,
    producer_id: str = "p0",
):
    """Write one producer epoch: route rows to partitions by key hash,
    one segment file per (epoch, producer, partition), atomic
    tmp+rename so an epoch REPLAY overwrites its own segment —
    idempotent, hence exactly-once end to end (the
    transactional-producer twin). ``producer_id`` namespaces segments
    so independent producers feeding one topic never collide on epoch
    ids (Kafka's producer-id field); per-partition order is (epoch,
    producer) lexicographic."""
    routed = batch_df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.pmod(
            F.xxhash64(F.coalesce(F.col("key"), F.col("value"))), F.lit(n_partitions)
        )
        .cast("int")
        .alias("__p"),
    ).repartition(n_partitions, "__p")

    def write_part(rows):
        by_p: dict[int, list] = {}
        for r in rows:
            by_p.setdefault(r["__p"], []).append((r["key"], r["value"]))
        for p, recs in by_p.items():
            pdir = os.path.join(bus, topic, f"p{p}")
            os.makedirs(pdir, exist_ok=True)
            final = os.path.join(pdir, f"{epoch_id:020d}-{producer_id}.jsonl")
            tmp = final + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                for k, v in recs:
                    fh.write(json.dumps({"k": k, "v": v}) + "\n")
            os.replace(tmp, final)

    routed.foreachPartition(write_part)


def bus_sink(
    sdf: DataFrame,
    bus: str,
    topic: str,
    checkpoint: str,
    n_partitions: int = 4,
    trigger_available_now: bool = False,
    producer_id: str = "p0",
):
    """Streaming producer (KafkaSink twin, sink.rs:15-72): expects
    `key`/`value` columns like the real kafka_sink; same key => same
    partition, in order. Epoch-segment rewrite makes replays
    idempotent (exactly-once), one better than the real sink's
    documented at-least-once. Give each concurrent producer feeding
    one topic its own ``producer_id``."""
    w = sdf.writeStream.foreachBatch(
        lambda df, eid: _write_epoch(df, eid, bus, topic, n_partitions, producer_id)
    ).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def bus_produce(
    df: DataFrame,
    bus: str,
    topic: str,
    epoch_id: int,
    n_partitions: int = 4,
    producer_id: str = "p0",
) -> None:
    """Batch producer: write one epoch of (key, value) rows — the test
    harness's seeding path, same routing and atomicity as bus_sink."""
    _write_epoch(df, epoch_id, bus, topic, n_partitions, producer_id)
