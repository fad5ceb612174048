"""Sources (reference SURVEY §2.6).

Every reference source is a partitioned poll loop with per-partition
persisted offsets (sources/stateful.rs:30-89); Spark's built-in
sources already implement exactly that contract (partition listing,
offset tracking in the checkpoint, redistribution on rescale), so
these are thin builders, not ports.

| reference                              | here                      |
|----------------------------------------|---------------------------|
| SingleIteratorSource (single_iterator.rs:41-84) | iterator_source   |
| StatefulSource file example (CustomSources.md)  | file_stream       |
| KafkaSource (malstrom-kafka/src/source.rs)      | kafka_stream      |
| StatelessSource (stateless.rs:24-69)            | rate_stream       |
| StatefulSource trait itself (stateful.rs:30-89) | custom.py (Python DataSource API) |
| Kafka CONTRACT, jar-free (source.rs:96-215)     | bus.py message bus twin |
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession


def iterator_source(
    spark: SparkSession,
    it: Iterable,
    schema,
    ts_from_index: bool = True,
) -> DataFrame:
    """In-memory iterator source (single_iterator.rs:41-84): timestamp =
    element index, matching the reference's `ts = i` convention. Batch
    DataFrame; drive streaming tests with file_stream instead.

    The iterator is driver-local by contract (as in the reference:
    emitted on worker 0), so `seq` is attached by enumerate() before
    parallelizing — no global single-partition window anywhere in the
    plan."""
    tuples = [(r,) if not isinstance(r, tuple) else r for r in it]
    if not ts_from_index:
        return spark.createDataFrame(tuples, schema)
    from pyspark.sql.types import LongType, StructField, StructType

    if isinstance(schema, str):
        seq_schema = schema + ", seq long"
    else:
        seq_schema = StructType(list(schema.fields) + [StructField("seq", LongType(), False)])
    return spark.createDataFrame([(*t, i) for i, t in enumerate(tuples)], seq_schema)


def parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch parquet scan of a driver test table — Catalyst pushes
    filters/projections into the scan (verify via PushedFilters in
    .explain)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def file_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming file source (reference file-source example,
    website/guide/CustomSources.md): one 'partition' per file, offsets
    = processed-file log in the checkpoint."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Unbounded generator source (StatelessSource analog,
    sources/stateless.rs:24-69)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source (malstrom-kafka/src/source.rs:48-123). Offsets are
    checkpoint-tracked natively — the reference's async commit-on-
    snapshot (source.rs:96-109) is Spark's WAL. Requires the Kafka
    connector jar on the classpath; gated so local test envs without
    it fail with a clear message."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    try:
        return reader.load()
    except Exception as exc:
        from ..sinks import _is_missing_kafka_source

        if _is_missing_kafka_source(exc):
            raise RuntimeError(
                "Kafka source needs spark-sql-kafka on the classpath "
                "(not bundled in this test environment)"
            ) from exc
        raise  # unrelated failures propagate unchanged
