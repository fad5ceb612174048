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
| (beyond reference) JSONL corpus ingest          | jsonl_corpus_source (corrupt-record quarantine) |
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


def jsonl_corpus_source(
    spark: SparkSession,
    path: str,
    schema,
    streaming: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """JSONL corpus ingestion with CORRUPT-RECORD ROUTING — the
    format real web corpora arrive in, where a truncated shard or a
    stray log line must neither kill the job (FAILFAST) nor vanish
    silently (DROPMALFORMED). PERMISSIVE mode captures every
    unparseable line in a rescue column; returns (good, bad):

    - good: rows matching `schema`, rescue column dropped;
    - bad:  (corrupt_record string) — the raw offending lines, ready
      for a quarantine sink / count alert.

    Built as text-scan + `from_json` rather than the native JSON
    reader: Spark forbids queries whose pruned schema is ONLY the
    internal corrupt-record column (exactly what a quarantine branch
    is), and the text form works identically for batch and streaming.
    The two returned DataFrames share the scan DEFINITION, not one
    execution: materializing both re-scans and re-parses the input
    once per side — callers consuming both branches should persist
    the parsed frame first (batch) or split inside one foreachBatch
    (streaming). Blank lines are skipped like the native reader.
    `streaming=True` returns streaming DataFrames (file-source
    checkpointing gives exactly-once over arriving shards)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    rescue = "_corrupt_record"
    full = StructType(list(schema.fields) + [StructField(rescue, StringType())])
    reader = spark.readStream if streaming else spark.read
    raw = reader.text(path).filter(F.length(F.trim(F.col("value"))) > 0)
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": rescue},
        ).alias("j"),
        F.col("value"),
    )
    good = parsed.filter(F.col(f"j.{rescue}").isNull()).select(
        *[F.col(f"j.{f.name}").alias(f.name) for f in schema.fields]
    )
    bad = parsed.filter(F.col(f"j.{rescue}").isNotNull()).select(
        F.col("value").alias("corrupt_record")
    )
    return good, bad
