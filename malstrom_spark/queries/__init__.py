"""Query registry: every implemented operator/query surfaces here as a
(name -> Spark callable) plus, where SQL-expressible, a DuckDB oracle
string. `__spark_entry__.py` re-exports this registry to the driver.

Invariant (driver contract): column names AND types of the Spark
result must match the oracle result; floating aggregates are made
engine-portable by summing in DECIMAL and casting the final value to
DOUBLE (exact, so both engines produce bit-identical doubles).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    from . import pipeline, relational, relational2, streaming  # noqa: F401  (import registers)

    return REGISTRY


def _ensure_conf(spark: SparkSession) -> None:
    """Engine-portability confs, set at runtime so queries behave the
    same under the driver's own SparkSession (not built by us):
    UTC session, LTZ parquet timestamps, nanos-as-long reads
    (Spark cannot read TIMESTAMP(NANOS) parquet, SPARK-40819)."""
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf in this session; session.py already set it


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # ns-epoch long -> microsecond LTZ timestamp (truncation,
            # same as DuckDB's ns->us narrowing)
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df
