"""Streaming queries in the correctness gate: each runs a bounded
Structured Streaming replay to completion (availableNow) and returns
the materialized result, so the DuckDB oracle can check the SAME
semantics a batch query would have — the reference's bounded-stream
testing pattern (SingleIteratorSource -> VecSink, SURVEY §5 layer 1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..streaming.replay import replay_table, run_to_memory
from ..streaming.stateful import running_totals_stream
from . import register


@register(
    "streaming_hourly_counts",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_hourly_counts(spark, sf_dir):
    """Windowed streaming aggregation (SURVEY §2.5 Windows): tumbling
    1h event counts computed BY THE STREAMING ENGINE (microbatch,
    state store), then compared against the batch oracle."""
    ev = replay_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    result = run_to_memory(agg, output_mode="complete")
    return result.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
    )


@register(
    "streaming_user_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def streaming_user_totals(spark, sf_dir):
    """Keyed stateful streaming op (applyInPandasWithState — reference
    stateful_map semantics, stateful_map.rs:60-110): per-user running
    totals; with a single availableNow batch the final emission equals
    the batch aggregate, which the oracle checks.

    Note: sums accumulate in float64 inside the state; the oracle sum
    is decimal-exact. Values are 2-decimal and per-key counts are
    small, so float64 error < 1e-9 — the final cast-to-2-decimal
    comparison (round trip through DOUBLE) stays bit-stable. To keep
    the hash robust we round both sides via the decimal cast."""
    ev = replay_table(spark, sf_dir, "events").select("user_id", "value")
    out = running_totals_stream(ev)
    result = run_to_memory(out, output_mode="append")
    return result.select(
        "user_id",
        "n_events",
        F.col("total_value").cast("decimal(28,2)").cast("double").alias("total_value"),
    )
