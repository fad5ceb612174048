"""SCD2 history builder — turn a change-event log into a type-2
slowly-changing-dimension table: one row per (key, attribute-state)
interval with [valid_from, valid_to) bounds and a current flag. The
reference has no warehouse-side operators at all (SURVEY §2.8); this
is the standard dimension-maintenance primitive a user migrating a
pipeline onto the engine needs next to the as-of join (asof.py reads
such tables point-in-time).

Semantics:
- events are ordered per key by (ts, tiebreak) — supply a tiebreak
  column whenever ts can collide, or interval order is undefined;
- with drop_unchanged (default) an event whose tracked attributes
  null-safely equal the previous event's is a no-op and opens no new
  interval (true SCD2: intervals change only when values change);
- valid_to = the NEXT interval's valid_from (half-open, adjacent,
  no gaps); null valid_to marks the current row.

Physical shape (100 TB): ONE shuffle+sort on the key — the lag()
dedup pass and the lead() close pass share the same window spec, so
Catalyst reuses the single Exchange+Sort for both (no second
shuffle). State per key is one row of lookback, never the history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    attrs: Sequence[str],
    tiebreak: str | None = None,
    drop_unchanged: bool = True,
) -> DataFrame:
    """Build the SCD2 table: key cols + attrs + valid_from/valid_to
    (+ is_current boolean)."""
    attrs = list(attrs)
    if not attrs:
        raise ValueError("attrs must be non-empty: SCD2 tracks at least one attribute")
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)

    cur = df
    if drop_unchanged:
        # null-safe: a change to/from NULL is a real change
        is_first = F.lag(F.lit(1)).over(w).isNull()
        differs = None
        for a in attrs:
            d = ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
            differs = d if differs is None else (differs | d)
        cur = df.withColumn("__keep", is_first | differs).filter("__keep").drop("__keep")

    out = cur.select(
        *keys,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(F.col(ts)).over(w).alias("valid_to"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key: str | Sequence[str],
    ts: str,
    how: str = "left",
) -> DataFrame:
    """POINT-IN-TIME enrichment against an SCD2 dimension (the read
    side of `scd2_history` — 'the customer's tier as of the order
    date'): each fact row joins the dim version whose half-open
    [valid_from, valid_to) interval contains fact.`ts`; the open
    interval (valid_to null) extends to +infinity. Intervals are
    non-overlapping per key by SCD2 construction, so at most one dim
    row matches — `how='left'` (default) keeps facts that predate the
    key's first interval, with null dim attributes.

    Physical shape (100 TB): an equi-join on the key with the
    containment predicate as a join residual — SortMergeJoin on the
    key (or broadcast when the dim is small), never a
    nested-loop/cartesian; dim state per key is its version count,
    not the fact volume."""
    keys = [key] if isinstance(key, str) else list(key)
    missing = [c for c in ("valid_from", "valid_to") if c not in dim.columns]
    if missing:
        raise ValueError(
            f"scd2_lookup: dim is missing SCD2 interval column(s) {missing}; "
            "build it with scd2_history (valid_from/valid_to required)"
        )
    overlap = sorted(
        (set(facts.columns) & set(dim.columns)) - set(keys)
    )
    if overlap:
        raise ValueError(
            f"scd2_lookup: non-key column(s) {overlap} exist on both facts "
            "and dim — the output would carry ambiguous duplicate names; "
            "rename or drop them on one side first"
        )
    f, d = facts.alias("__f"), dim.alias("__d")
    cond = None
    for k in keys:
        c = F.col(f"__f.{k}") == F.col(f"__d.{k}")
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (F.col(f"__f.{ts}") >= F.col("__d.valid_from"))
        & (F.col("__d.valid_to").isNull() | (F.col(f"__f.{ts}") < F.col("__d.valid_to")))
    )
    dim_cols = [c for c in dim.columns if c not in keys]
    return f.join(d, cond, how).select(
        *[F.col(f"__f.{c}") for c in facts.columns],
        *[F.col(f"__d.{c}") for c in dim_cols],
    )
