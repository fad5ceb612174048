"""Window sugar (reference SURVEY §2.5 'Windows').

The reference has NO built-in window operator — tumbling/monthly
windows are hand-built from `stateful_op.on_epoch` evicting closed
keys (examples/event_time.rs:107-152). Spark gives tumbling, sliding
and session windows natively; these helpers standardize the output
shape (window_start/window_end columns instead of a struct) so queries
and oracles can compare them as plain columns.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _unpack_window(grouped: DataFrame) -> DataFrame:
    return grouped.withColumns(
        {"window_start": F.col("window.start"), "window_end": F.col("window.end")}
    ).drop("window")


def tumbling(
    df: DataFrame,
    ts_col: str,
    size: str,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
) -> DataFrame:
    """Fixed windows, e.g. size='1 hour' — supersedes the reference's
    hand-rolled monthly-balance pattern (event_time.rs:107-152)."""
    g = df.groupBy(F.window(ts_col, size), *keys).agg(
        *[a.alias(n) for n, a in aggs.items()]
    )
    return _unpack_window(g)


def sliding(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
) -> DataFrame:
    g = df.groupBy(F.window(ts_col, size, slide), *keys).agg(
        *[a.alias(n) for n, a in aggs.items()]
    )
    return _unpack_window(g)


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
) -> DataFrame:
    """Session windows with inactivity gap; in streaming combine with
    `limit_out_of_orderness` for state eviction."""
    g = df.groupBy(F.session_window(ts_col, gap), *keys).agg(
        *[a.alias(n) for n, a in aggs.items()]
    )
    return g.withColumns(
        {
            "session_start": F.col("session_window.start"),
            "session_end": F.col("session_window.end"),
        }
    ).drop("session_window")
