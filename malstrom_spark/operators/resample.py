"""Time-series resampling — densify a per-key event series onto a
regular bucket grid and forward-fill gaps: the hypertable
gap-filling primitive (TimescaleDB's time_bucket_gapfill + locf,
re-expressed declaratively) that turns irregular events into the
regular series every downstream rollup/forecast expects. Companion
to operators/windows.py's hypertable rollup (which aggregates the
buckets that EXIST; this materializes the ones that don't).

Semantics:
- each key's grid spans ITS OWN [min, max] bucket (no global grid —
  keys don't get phantom history before their first event);
- `agg` reduces multiple events per bucket first (default: last by
  event time — supply any aggregate Column);
- gaps carry the previous bucket's value forward (locf); the gap
  row's `is_gap` flag stays true so consumers can distinguish
  carried values from observed ones.

100 TB shape: one groupBy per key to find the span + bucket
aggregate (combinable), one per-key sequence explode (the grid is
generated, not joined against a calendar table), one left join
grid<-buckets on (key, bucket), and ONE window (partitioned by key,
ordered by bucket) for the forward fill — the minimum for locf
semantics. Grid size is bounded by span/step per key; guard
`max_buckets` fails loudly on a key whose span would explode the
grid (a 1970-epoch outlier row would otherwise generate 50 years of
hourly buckets)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    agg: Column | None = None,
    max_buckets: int = 100_000,
) -> DataFrame:
    """(key, bucket TIMESTAMP, value, is_gap) — dense per-key grid at
    `step`, gaps forward-filled (value NULL until the first
    observation; locf has nothing to carry before it)."""
    step_expr = F.expr(f"INTERVAL {step}")
    bucket = F.window(F.col(ts_col), step).start.alias("__b")
    per_bucket_agg = agg if agg is not None else F.max_by(
        F.col(value_col), F.col(ts_col))
    buckets = (
        df.select(F.col(key_col), F.col(ts_col), F.col(value_col))
        .groupBy(key_col, bucket)
        .agg(per_bucket_agg.alias("__v"))
    )
    spans = buckets.groupBy(key_col).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    step_secs = F.unix_timestamp(
        F.to_timestamp(F.lit("1970-01-01 00:00:00")) + step_expr
    )
    n_buckets = (
        F.unix_timestamp("__hi") - F.unix_timestamp("__lo")
    ) / step_secs
    # the guard rides INSIDE the sequence bound — a free-standing
    # guard column would be pruned away by Catalyst and never fire
    hi_guarded = F.when(n_buckets <= F.lit(max_buckets), F.col("__hi")).otherwise(
        F.raise_error(F.lit(
            f"resample_locf: key grid exceeds max_buckets={max_buckets} "
            f"for step '{step}' — clean outlier timestamps or raise "
            "the guard"
        )).cast("timestamp")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence(F.col("__lo"), hi_guarded, step_expr)
        ).alias("__b"),
    )
    joined = grid.join(buckets, [key_col, "__b"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = F.last("__v", ignorenulls=True).over(w)
    return joined.select(
        F.col(key_col),
        F.col("__b").alias("bucket"),
        filled.alias(value_col),
        F.col("__v").isNull().alias("is_gap"),
    )
