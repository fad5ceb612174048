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


# approx_distinct partials are Apache DataSketches HLL sketches
# (binary, mergeable): the ONLY way a distinct count can roll up —
# COUNT(DISTINCT) partials don't merge, so a continuous aggregate
# either re-scans raw data per grain or carries a mergeable sketch.
# hll_union_agg over sub-sketches == sketching the unioned data, so
# day/week/month distincts derive from persisted hour partials with
# zero raw rescan, same as every other kind here.
_PARTIAL = {
    "count": F.count, "sum": F.sum, "min": F.min, "max": F.max,
    "approx_distinct": F.hll_sketch_agg,
}
_MERGE = {
    "count": F.sum, "sum": F.sum, "min": F.min, "max": F.max,
    "approx_distinct": F.hll_union_agg,
}


def _final_expr(kind: str, name: str) -> Column:
    """Per-branch output projection: sketches estimate to a BIGINT at
    the edge; every other kind passes through."""
    if kind == "approx_distinct":
        return F.hll_sketch_estimate(F.col(name)).alias(name)
    return F.col(name)


def _check_decomposable(aggs: Mapping[str, tuple[str, Column]]) -> None:
    bad = [n for n, (k, _) in aggs.items() if k not in _PARTIAL]
    if bad:
        raise ValueError(
            f"aggs {bad} are not decomposable "
            "(use count/sum/min/max/approx_distinct; derive avg as "
            "sum/count; exact distinct does not decompose — that is "
            "what approx_distinct's mergeable HLL sketch is for)"
        )


# date_trunc units ordered finest -> coarsest; used to validate that a
# rollup chain is computable from the finest grain's partials alone
_GRAIN_RANK = {
    "second": 0, "minute": 1, "hour": 2, "day": 3,
    "week": 4, "month": 5, "quarter": 6, "year": 7,
}


def _validate_grains(grains: Sequence[str]) -> None:
    """Reject grain chains whose coarser members cannot be derived
    exactly from the finest grain's buckets. `date_trunc(g,
    date_trunc(finest, ts)) == date_trunc(g, ts)` holds only when
    every g-boundary is a finest-boundary: true for the whole
    second..day..month..quarter..year tower, but week boundaries are
    not month/quarter/year boundaries (and vice versa), so the two
    calendar families cannot share one chain."""
    if not grains:
        raise ValueError("grains must be non-empty")
    unknown = [g for g in grains if g not in _GRAIN_RANK]
    if unknown:
        raise ValueError(
            f"unknown grain(s) {unknown}; supported: {list(_GRAIN_RANK)}"
        )
    finest = grains[0]
    for finer, coarser in zip(grains, grains[1:]):
        if _GRAIN_RANK[coarser] <= _GRAIN_RANK[finer]:
            raise ValueError(
                f"grains must be ordered finest -> coarsest; got {coarser!r} "
                f"after {finer!r}"
            )
    # every coarser grain must nest the FINEST one (each branch derives
    # from the finest partials): the only non-nesting case the ordering
    # check leaves reachable is finest=week under month/quarter/year
    # (month boundaries fall mid-week); day-or-finer roots may carry
    # BOTH week and calendar grains, since each nests day independently
    for g in grains[1:]:
        if finest == "week" and g in ("month", "quarter", "year"):
            raise ValueError(
                f"grain {g!r} does not nest the finest grain 'week' "
                "(week and month/quarter/year boundaries do not align); "
                "root the chain at day or finer, or run separate chains"
            )


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, Column]],
    grains: Sequence[str] = ("hour", "day", "week"),
) -> DataFrame:
    """Multi-grain time rollup (TimescaleDB continuous-aggregate /
    hypertable shape): one pass over the raw data computes the FINEST
    grain's partial aggregates; every coarser grain re-aggregates
    those partials instead of rescanning raw rows. Output is the
    union of all grains tagged with a `grain` column and a `bucket`
    timestamp (date_trunc of the finest bucket).

    aggs maps output name -> (kind, column) where kind is one of
    'count' | 'sum' | 'min' | 'max' | 'approx_distinct' — the
    decomposable aggregates whose partials merge losslessly (count
    merges by sum; min/max by themselves; approx_distinct carries a
    mergeable DataSketches HLL sketch whose union over sub-buckets
    equals sketching the union, estimated to BIGINT at the output
    edge). avg is derived by the caller as sum/count so it rolls up
    exactly too; EXACT distinct does not decompose — at 100 TB a
    distinct-per-grain either rescans raw data per grain or rides a
    sketch, which is why approx_distinct is first-class here.

    Scale shape: the finest-grain aggregation is ONE shuffle of the
    raw data keyed on (bucket, keys); every coarser branch hangs off
    that same aggregate subplan, so Catalyst's exchange reuse
    materializes the partial-aggregate shuffle once and the coarser
    grains re-shuffle only the (tiny) partials table
    (tests/test_rangejoin.py asserts the ReusedExchange). At 100 TB
    the same decomposition works across jobs: persist the finest
    partials as a bucketed table (operators/bucketing.py) and derive
    day/week/month views from it without touching raw data again —
    the continuous-aggregate pattern.

    grains must be ordered finest -> coarsest, each a valid
    date_trunc unit, and each coarser grain must nest the FINEST one
    (every coarser bucket is a whole number of finest buckets; each
    branch derives from the finest partials, not from each other) —
    VALIDATED here, because a non-nesting chain silently produces
    wrong buckets: week boundaries are not month boundaries, so
    `date_trunc('month', week_start)` lands mid-month rows in the
    previous month. Concretely: a chain rooted at week cannot carry
    month/quarter/year; a chain rooted at day or finer may carry
    BOTH week and the calendar grains (each nests day independently).
    """
    _validate_grains(grains)  # whole chain, before any plan is built
    partials = hypertable_partials(df, ts_col, keys, aggs, grain=grains[0])
    return hypertable_from_partials(partials, keys, aggs, grains)


def hypertable_partials(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, Column]],
    grain: str = "hour",
) -> DataFrame:
    """The finest-grain partial-aggregate table of a hypertable rollup
    — (bucket, keys..., agg columns), one shuffle over the raw data.
    This is the CONTINUOUS-AGGREGATE stage table: persist it once per
    ingest batch (operators/bucketing.persist_stage, bucketed on the
    series keys) and every coarser grain, in any later job, derives
    from it with zero raw-data scan — and zero Exchange, because a
    hash bucketing on `keys` already satisfies the coarser
    groupBy(date_trunc(g, bucket), keys) clustering (keys is a subset
    of the grouping). Bucket on a high-cardinality series key (device,
    user, symbol) so the buckets stay balanced at 100 TB."""
    _validate_grains((grain,))
    _check_decomposable(aggs)
    return df.groupBy(F.date_trunc(grain, F.col(ts_col)).alias("bucket"), *keys).agg(
        *[_PARTIAL[k](col).alias(n) for n, (k, col) in aggs.items()]
    )


def hypertable_from_partials(
    partials: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, Column]],
    grains: Sequence[str] = ("hour", "day", "week"),
) -> DataFrame:
    """Derive the multi-grain rollup from an existing finest-grain
    partials table (grains[0] must be the grain `partials` was built
    at — it labels the passthrough branch; coarser grains re-aggregate
    the partials). Same output contract as `hypertable_rollup`."""
    keys = list(keys)
    _validate_grains(grains)
    _check_decomposable(aggs)
    finest = grains[0]
    # merged aggregates cast back to the partials' exact types (sum
    # over decimal widens precision; sum over count's long stays long)
    # so every grain branch carries one schema through the union
    merge_exprs = [
        _MERGE[k](F.col(n)).cast(partials.schema[n].dataType).alias(n)
        for n, (k, _) in aggs.items()
    ]
    final_exprs = [_final_expr(k, n) for n, (k, _) in aggs.items()]
    out = partials.select(F.lit(finest).alias("grain"), "bucket", *keys, *final_exprs)
    for g in grains[1:]:
        rolled = partials.groupBy(
            F.date_trunc(g, F.col("bucket")).alias("bucket"), *keys
        ).agg(*merge_exprs)
        out = out.unionByName(
            rolled.select(F.lit(g).alias("grain"), "bucket", *keys, *final_exprs)
        )
    return out


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
