"""SparkSession factory tuned for the malstrom-spark engine.

The reference runtime (malstrom-core/src/runtime/threaded/multi.rs:44-120)
spins up N identical workers; on Spark the equivalent knob set is the
master URL + shuffle partitioning + AQE. Everything here is plain
configuration — Structured Streaming supplies snapshots/recovery
(reference: malstrom-core/src/snapshot/mod.rs) via checkpointLocation.

Scale notes (100 TB design intent):
- AQE on: runtime coalescing + skew-join splitting replaces hand tuning.
- shuffle.partitions defaults to cores locally; on a real cluster set it
  ~2-3x total cores or rely on AQE coalescing from a high initial value.
- Arrow on: every Python-side operator (pandas UDFs) moves columnar.
- RocksDB state store: keyed state spills to disk, unlike the
  reference's in-memory IndexMap (stateful_op.rs:115), so stateful
  streaming survives key cardinalities far beyond RAM.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "malstrom-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # read naive parquet timestamps as LTZ(=UTC session): keeps
        # unix_micros/date_format/watermarks on the standard type
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Spark has no TIMESTAMP(NANOS) support (SPARK-40819): read as
        # long; loaders convert ns->us explicitly (queries/__init__.table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def get_spark() -> SparkSession:
    """Return the active session or build one with defaults."""
    active = SparkSession.getActiveSession()
    return active if active is not None else build_session()
