"""Streaming late-data side output (SURVEY §4.3.1 strategy (a)).

The reference's `generate_epochs` returns an (on_time, late) stream
PAIR — records at or below the current epoch divert to the late
stream (generate_epochs.rs:44,124-126; time/util.rs
`handle_maybe_late_msg`). Spark's `withWatermark` silently DROPS late
rows instead, so this module reproduces the side output with a small
stateful operator that tracks the event-time frontier itself.

Design: rows are sharded onto `n_shards` routing keys (uniform hash);
each shard keeps `max event time seen` as its state and flags a row
late iff `ts <= shard_frontier - delay` at the moment it arrives.
Like the reference, the frontier advances only AFTER a batch of
records is judged (epoch emitted after the triggering record,
generate_epochs.rs:73-123), and like the reference the frontier is
per-worker, not global — Spark's shard ≈ the reference's worker, so
lateness is judged against locally-observed progress. A row is
flagged, never dropped: callers split the output exactly like the
reference's stream pair:

    flagged = flag_late_stream(events, "ts", delay_sec=600)
    on_time = flagged.filter(~F.col("is_late"))
    late    = flagged.filter(F.col("is_late"))

Scale notes: state per shard is ONE timestamp — n_shards total longs
across the cluster, negligible. The extra shuffle is the cost of the
side output; when late data only needs counting, prefer
`observe()`/StreamingQueryListener on the main query instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

_SHARD = "__shard"


def flag_late_stream(
    sdf: DataFrame,
    ts_col: str,
    delay_sec: float,
    n_shards: int = 32,
) -> DataFrame:
    """Append an `is_late` column to a streaming DataFrame, judged
    against a per-shard event-time frontier (reference late-split
    semantics). Output schema = input schema + is_late boolean."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    in_fields = list(sdf.schema.fields)
    out_schema = StructType(in_fields + [StructField("is_late", BooleanType())])
    in_cols = [f.name for f in in_fields]

    def judge(key, pdfs, state: GroupState):
        import pandas as pd

        frontier_us = state.get[0] if state.exists else None
        for pdf in pdfs:
            ts_us = (pdf[ts_col].astype("datetime64[us]").astype("int64")).to_numpy()
            if frontier_us is None:
                late = [False] * len(pdf)
            else:
                late = ts_us <= (frontier_us - int(delay_sec * 1_000_000))
            out = pdf[in_cols].copy()
            out["is_late"] = late
            if len(ts_us):
                batch_max = int(ts_us.max())
                frontier_us = batch_max if frontier_us is None else max(frontier_us, batch_max)
            yield out
        if frontier_us is not None:
            state.update((frontier_us,))

    sharded = sdf.withColumn(
        _SHARD, F.pmod(F.xxhash64(*[F.col(c) for c in in_cols]), F.lit(n_shards))
    )
    flagged = sharded.groupBy(_SHARD).applyInPandasWithState(
        judge,
        outputStructType=out_schema,
        stateStructType="frontier_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return flagged.select(*in_cols, "is_late")
