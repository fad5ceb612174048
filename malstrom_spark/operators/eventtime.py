"""Event time / watermark operators (reference SURVEY §2.5, §4.3).

- assign_timestamps      -> reference operators/time/assign_timestamps.rs:21-63
- limit_out_of_orderness -> reference operators/time/generate_epochs.rs:134-151
- generate_epochs late-split -> generate_epochs.rs:39-127 + time/util.rs

Epoch semantics map as: epoch T (no future records <= T) == Spark
watermark; `Timestamp::MAX` end-of-stream == bounded input +
availableNow trigger. The reference supports arbitrary ordered types
as timestamps (types/time.rs:6-17); Spark watermarks need
TimestampType, so `as_event_time` adapts integer/date logical times to
epoch timestamps (documented convention, SURVEY §4.3.2).

The one semantic delta needing real code: the reference's
`generate_epochs` returns an (on_time, late) stream PAIR
(generate_epochs.rs:44,124-126) while Spark silently drops late rows.
`split_late` reproduces the side output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_timestamps(df: DataFrame, expr: Column | str, ts_col: str = "event_ts") -> DataFrame:
    """Set the event-time column (assign_timestamps.rs:21-63).

    The reference drops all prior epochs when timestamps are
    reassigned; the Spark analog is simply that any previous
    `withWatermark` applies to the old column — re-call
    `limit_out_of_orderness` after this, as the reference's
    `NeedsEpochs` return type forces."""
    e = F.expr(expr) if isinstance(expr, str) else expr
    return df.withColumn(ts_col, e)


def as_event_time(df: DataFrame, numeric_col: str, ts_col: str = "event_ts") -> DataFrame:
    """Adapter: integer/offset logical time -> TimestampType
    (SURVEY §4.3.2; reference uses Kafka offsets as time,
    malstrom-kafka/src/source.rs:79-81). Seconds-since-epoch scale."""
    return df.withColumn(ts_col, F.timestamp_seconds(F.col(numeric_col)))


def limit_out_of_orderness(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Bounded-disorder watermark: epoch = max_seen_ts - delay
    (generate_epochs.rs:134-151) == exactly `withWatermark`.

    On a batch DataFrame this is a no-op marker (batch has no
    watermark), kept so the same pipeline definition runs both modes.
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def split_late(
    df: DataFrame,
    ts_col: str,
    delay_expr: str,
    order_cols: list[str] | None = None,
    n_shards: int = 32,
    shard_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(on_time, late) split for batch replays (generate_epochs.rs:44).

    A record is late iff its event time is <= the frontier
    (max event time seen so far in arrival order, minus the bound) at
    the moment it arrives — reference rule in time/util.rs
    `handle_maybe_late_msg`. `order_cols` define arrival order (the
    current row order is unknowable in batch, so an explicit arrival
    column is required).

    The frontier is judged PER SHARD, matching the reference, which
    judges lateness against each WORKER's locally observed progress,
    not a global order (time/util.rs). This is also what makes the
    operator scale: a global frontier would be one unpartitioned
    window — every row through a single task. Each shard is an
    independent running-max window; no task sees more than ~1/n_shards
    of the data.

    Shard assignment is `pmod(xxhash64(shard_cols), n_shards)`, where
    `shard_cols` defaults to ALL input columns — the exact key the
    streaming twin `flag_late_stream` uses, so with matching
    `shard_cols`/`n_shards` the same record lands on the same shard in
    both paths. Pass an explicit subset (e.g. the arrival-order
    columns) to both twins to shard on identity alone.

    BEHAVIOR NOTE: `n_shards` defaults to 32 (per-worker frontier
    semantics). Before round 3 the frontier was GLOBAL — callers
    wanting one totally-ordered frontier must pass `n_shards=1`.

    `delay_expr` is a SQL interval expression, e.g. "INTERVAL 10 MINUTES".
    """
    if not order_cols:
        raise ValueError("split_late needs explicit arrival-order columns in batch mode")
    hash_cols = shard_cols if shard_cols else [f.name for f in df.schema.fields]
    shard = F.pmod(F.xxhash64(*[F.col(c) for c in hash_cols]), F.lit(n_shards))
    flagged = df.withColumn("__shard", shard)
    w = (
        Window.partitionBy("__shard")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = F.max(ts_col).over(w) - F.expr(delay_expr)
    flagged = flagged.withColumn("__late", F.col(ts_col) <= frontier)
    on_time = flagged.filter(~F.coalesce("__late", F.lit(False))).drop("__late", "__shard")
    late = flagged.filter(F.coalesce("__late", F.lit(False))).drop("__late", "__shard")
    return on_time, late


def inspect_frontier(df: DataFrame, ts_col: str, name: str = "frontier"):
    """PER-OPERATOR frontier observation — full parity with the
    reference's `inspect_frontier`, which attaches to any operator in
    the dataflow (operators/time/inspect_frontier.rs:15-46), not just
    at query level. Wraps this point of the plan in `observe()` with
    (frontier_ts = max event time, min_ts, n_rows) metrics over
    exactly the rows crossing THIS point.

    Returns ``(df, handle)``:
    - batch: ``handle`` is a `pyspark.sql.Observation`; after the next
      action, ``handle.get`` yields the metrics dict.
    - streaming: ``handle`` is None; each microbatch's metrics arrive
      in ``progress.observedMetrics[name]`` — subscribe with
      `observed_frontier_listener(name, fn)`.

    Cost: observe is an accumulator-backed pass-through node — no
    extra scan, no shuffle, and column pruning above/below is
    unaffected; this is the Spark-native analog of the reference's
    zero-copy pass-through inspection."""
    metrics = [
        F.max(F.col(ts_col)).alias("frontier_ts"),
        F.min(F.col(ts_col)).alias("min_ts"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    if df.isStreaming:
        return df.observe(name, *metrics), None
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def observed_frontier_listener(name: str, fn):
    """Listener companion of `inspect_frontier` for streaming: calls
    ``fn(metrics_row)`` with the named observation of every microbatch
    (metrics_row has frontier_ts / min_ts / n_rows)."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _ObservedListener(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            m = (event.progress.observedMetrics or {}).get(name)
            if m is not None:
                fn(m)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    return _ObservedListener()


def inspect_frontier_listener(fn):
    """Observe QUERY-LEVEL watermark progress via a
    StreamingQueryListener reading progress.eventTime['watermark'] —
    the engine's own frontier; `inspect_frontier` above is the
    per-operator attachment (inspect_frontier.rs:15-46 parity)."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _FrontierListener(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            wm = (event.progress.eventTime or {}).get("watermark")
            if wm is not None:
                fn(wm)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    return _FrontierListener()
