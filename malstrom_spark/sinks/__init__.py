"""Sinks (reference SURVEY §2.7).

| reference                          | here                          |
|------------------------------------|-------------------------------|
| VecSink (sinks/vec_sink.rs:14-62)  | memory_sink / DataFrame.collect |
| StdOutSink (sinks/stdout.rs:14)    | console_sink                  |
| StatefulSink file example          | parquet_sink (exactly-once via Spark's file commit protocol) |
| StatelessSink (stateless.rs:20-56) | foreach_batch_sink (at-least-once, same compromise as reference) |
| KafkaSink (malstrom-kafka/sink.rs) | kafka_sink                    |

Exactly-once story (SURVEY §2.9): state is exactly-once via
checkpointing; sink output is exactly-once only for idempotent /
transactional targets (files, Delta) — identical to the reference's
documented model (website/guide/StatefulPrograms.md 'Exactly Once').
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


def memory_sink(sdf: DataFrame, name: str, output_mode: str = "append"):
    """Collect a streaming query into an in-memory table (VecSink
    analog) — test use only; bounded inputs terminate via
    processAllAvailable()."""
    return (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def console_sink(sdf: DataFrame, output_mode: str = "append"):
    return sdf.writeStream.format("console").outputMode(output_mode).start()


def parquet_sink(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: Sequence[str] = (),
    trigger_available_now: bool = False,
):
    """File sink with exactly-once output via Spark's commit protocol —
    replaces the reference's hand-rolled stateful file sink
    (examples/file_sink_stateful.rs:15-90)."""
    w = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def foreach_batch_sink(
    sdf: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    trigger_available_now: bool = False,
):
    """Arbitrary per-microbatch sink (StatelessSink analog). fn gets
    (batch_df, epoch_id); use epoch_id for idempotent writes."""
    w = sdf.writeStream.foreachBatch(fn).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def kafka_sink(sdf: DataFrame, bootstrap_servers: str, topic: str, checkpoint: str):
    """Kafka producer sink (malstrom-kafka/src/sink.rs:15-72); expects
    key/value binary columns per Spark's Kafka contract. Fails fast
    with a clear message when the connector jar is absent (same gate
    as kafka_stream; tests/test_kafka_gap.py)."""
    try:
        return (
            sdf.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint)
            .start()
        )
    except Exception as exc:
        if _is_missing_kafka_source(exc):
            raise RuntimeError(
                "Kafka sink needs spark-sql-kafka on the classpath "
                "(not bundled in this test environment)"
            ) from exc
        raise  # unrelated failures (checkpoint path, options, auth) propagate


def _is_missing_kafka_source(exc: Exception) -> bool:
    """True only for the connector-jar-absent failure, so genuine
    errors (bad checkpoint path, invalid options, auth) are not
    misreported as a missing jar."""
    msg = str(exc)
    return (
        "Failed to find data source: kafka" in msg
        or "DATA_SOURCE_NOT_FOUND" in msg
        or ("ClassNotFoundException" in msg and "kafka" in msg.lower())
    )
