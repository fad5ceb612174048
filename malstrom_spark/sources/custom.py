"""User-extensible partitioned streaming source — parity with the
reference's `StatefulSource` trait (sources/stateful.rs:30-89) and its
file-source example (examples/file_source_stateful.rs:28-95,
website/guide/CustomSources.md).

The reference contract: a source lists partitions (`list_parts`), each
partition polls records and keeps persistent per-partition state (the
offset), snapshots restore that state on recovery
(sources/stateful.rs:205-342, recovery proof :418-467). PySpark's
`DataSource`/`DataSourceStreamReader` is the same contract, Spark-
side: `latestOffset` advances the per-partition offset dict (persisted
in the checkpoint WAL — the snapshot), `partitions(start, end)` is the
partition listing for one microbatch, `read(partition)` is the poll
loop, and restart-from-checkpoint resumes from the committed offsets
without replaying (tests/test_custom_source.py mirrors
sources/stateful.rs:418-467).

`LineFileDataSource` is the reference's worked example: one partition
per file, per-partition state = next line number to read.

At scale: partition listing runs on the driver (same as the
reference's worker-0 listing, sources/stateful.rs:108-138) but reads
fan out to executors — one task per (file, line-range); offsets are a
dict of longs, negligible checkpoint weight.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("line_no", LongType()),
        StructField("line", StringType()),
    ]
)


class _LineRange(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class LineFileStreamReader(DataSourceStreamReader):
    """One source partition per file under `path`; offset = per-file
    next-line-number dict (the reference's per-partition state)."""

    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("option 'path' is required")

    def _list_files(self) -> list[str]:
        return sorted(
            os.path.join(self._dir, f)
            for f in os.listdir(self._dir)
            if f.endswith(".txt")
        )

    def _line_counts(self) -> dict[str, int]:
        counts = {}
        for p in self._list_files():
            with open(p, "rb") as fh:
                counts[p] = sum(1 for _ in fh)
        return counts

    def initialOffset(self) -> dict:
        # start of every currently-known partition; files discovered
        # later enter the offset dict at their first latestOffset
        return {p: 0 for p in self._list_files()}

    def latestOffset(self) -> dict:
        return self._line_counts()

    def partitions(self, start: dict, end: dict):
        parts = [
            _LineRange(p, start.get(p, 0), n)
            for p, n in end.items()
            if n > start.get(p, 0)
        ]
        # Spark requires >=1 partition per planned batch; an empty
        # range yields no rows
        return parts or [_LineRange("", 0, 0)]

    def read(self, partition: _LineRange):
        if not partition.path:
            return
        name = os.path.basename(partition.path)
        with open(partition.path, encoding="utf-8") as fh:
            for i, line in enumerate(fh):
                if i < partition.start:
                    continue
                if i >= partition.end:
                    break
                yield (name, i, line.rstrip("\n"))

    def commit(self, end: dict) -> None:
        # offsets live in the checkpoint WAL; nothing external to ack
        # (the reference's KafkaSource commits async here)
        pass


class LineFileDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "malstrom_line_files"

    def schema(self):
        return SCHEMA

    def streamReader(self, schema):
        return LineFileStreamReader(self.options)


def register_line_file_source(spark) -> str:
    """Register the source; read with
    spark.readStream.format('malstrom_line_files').option('path', dir).load()."""
    spark.dataSource.register(LineFileDataSource)
    return LineFileDataSource.name()
