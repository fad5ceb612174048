"""Time-series gap filling (operators/resample.py)."""

import pytest

from pyspark.sql import functions as F

from malstrom_spark.operators.resample import resample_locf


def _events(spark):
    rows = [
        ("a", "2024-01-01 00:10:00", 1.0),
        ("a", "2024-01-01 00:50:00", 2.0),   # same bucket: max -> 2.0
        ("a", "2024-01-01 03:05:00", 9.0),   # 2 gap hours before
        ("b", "2024-01-01 05:00:00", 7.0),   # single bucket, no grid
    ]
    return spark.createDataFrame(rows, "k string, ts string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))


def test_grid_fill_and_flags(spark):
    out = resample_locf(_events(spark), "k", "ts", "value",
                        step="1 hour", agg=F.max("value"))
    got = {(r["k"], str(r["bucket"])): (r["value"], r["is_gap"])
           for r in out.collect()}
    assert got == {
        ("a", "2024-01-01 00:00:00"): (2.0, False),
        ("a", "2024-01-01 01:00:00"): (2.0, True),   # carried
        ("a", "2024-01-01 02:00:00"): (2.0, True),   # carried
        ("a", "2024-01-01 03:00:00"): (9.0, False),
        ("b", "2024-01-01 05:00:00"): (7.0, False),
    }


def test_per_key_span_no_phantom_history(spark):
    out = resample_locf(_events(spark), "k", "ts", "value").collect()
    b_rows = [r for r in out if r["k"] == "b"]
    assert len(b_rows) == 1  # b's grid is its own span, not a's


def test_max_buckets_guard_fires(spark):
    df = spark.createDataFrame(
        [("a", "1970-01-01 00:00:00", 1.0), ("a", "2024-01-01 00:00:00", 2.0)],
        "k string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(Exception, match="max_buckets"):
        resample_locf(df, "k", "ts", "value", max_buckets=1000).collect()


def test_single_window_plan(spark):
    plan = resample_locf(_events(spark), "k", "ts", "value") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1
