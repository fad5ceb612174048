"""Bounded-replay helpers: drive a Structured Streaming query from the
driver's parquet tables and run it to completion.

This is the Spark analog of the reference's bounded-source pattern —
`SingleIteratorSource` emits a `usize::MAX` epoch at end of input
(sources/single_iterator.rs:41-84), terminating the job; here the
parquet file source + `availableNow` trigger plays that role
(SURVEY §3.2 step 5).
"""

from __future__ import annotations

import pathlib
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def replay_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame replaying a driver test table. Schema comes
    from a batch peek (file streams need explicit schemas)."""
    from ..queries import _ensure_conf

    _ensure_conf(spark)
    path = f"{sf_dir}/{name}.parquet"
    # the file stream source wants a DIRECTORY; stage a symlink dir
    stage = pathlib.Path(tempfile.gettempdir()) / "malstrom_replay" / sf_dir.strip("/").replace("/", "_") / name
    stage.mkdir(parents=True, exist_ok=True)
    link = stage / "part-00000.parquet"
    if not link.exists():
        link.symlink_to(path)
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.format("parquet").schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    sdf = reader.load(str(stage))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(sdf.schema["ts"].dataType, LongType):
            sdf = sdf.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return sdf


def run_to_memory(
    sdf: DataFrame, output_mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Execute a streaming plan to completion (availableNow) into an
    in-memory table; returns the result as a batch DataFrame."""
    qname = name or f"replay_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = sdf.sparkSession
    return spark.table(qname)
