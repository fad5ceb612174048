"""CDC changelog compaction — collapse a change-data-capture log of
(key, op, payload) events into the current snapshot: the payload of
the latest surviving change per key, with keys whose latest op is a
delete dropped. This is the batch "apply the changelog" primitive a
user of the reference's stateful keyed operators reaches for first
(malstrom-core/src/stream/stateful.rs models the same thing as
per-key state overwritten by each event; here the whole log is
compacted in one declarative pass), and the table-maintenance core
of every lakehouse MERGE/upsert pipeline.

Semantics:
- events are totally ordered per key by (ts, tiebreak); supply a
  tiebreak whenever ts can collide (CDC sources emit LSNs/sequence
  numbers for exactly this reason) — without one, same-ts order is
  undefined and the snapshot is too;
- ops: inserts and updates both mean "this is the new image"
  (upsert); `delete_ops` values mean "the key is gone". A key whose
  LATEST event is a delete yields no row; a delete followed by a
  later insert re-materializes the key (standard CDC replay);
- output columns = keys + payload columns (op/ts/tiebreak dropped by
  default, keep with `keep_meta=True` for audit).

Physical shape (100 TB): ONE shuffle — the latest image per key is
`max_by(struct(payload), struct(ts, tiebreak))`, an aggregate with a
map-side partial combine, so each task reduces its input to one
candidate row per local key BEFORE anything moves (struct-valued
buffers make Spark pick SortAggregate, so the combine sorts
task-locally — but the shuffle still carries at most one row per
(key, task)). A window/row_number formulation would shuffle the FULL
log and sort every post-shuffle partition; on a year of CDC traffic
that is the difference between moving the snapshot and moving the
history. Delete filtering happens after the aggregate on the
compacted (small) relation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_compact(
    changelog: DataFrame,
    keys: str | Sequence[str],
    ts: str,
    op: str = "op",
    tiebreak: str | None = None,
    delete_ops: Sequence[str] = ("D", "delete"),
    keep_meta: bool = False,
) -> DataFrame:
    """Compact a CDC changelog into the current snapshot.

    changelog columns = keys + [op, ts, (tiebreak)] + payload. Returns
    keys + payload for every key whose latest event is not a delete.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    meta = {op, ts} | ({tiebreak} if tiebreak else set())
    missing = [c for c in (*keys, *meta) if c not in changelog.columns]
    if missing:
        raise ValueError(f"cdc_compact: changelog is missing column(s) {missing}")
    payload = [c for c in changelog.columns if c not in keys and c not in meta]

    order = F.struct(F.col(ts), *([F.col(tiebreak)] if tiebreak else []))
    carried = [op, ts] + ([tiebreak] if tiebreak else []) + payload
    image = F.max_by(F.struct(*[F.col(c) for c in carried]), order)

    latest = changelog.groupBy(*keys).agg(image.alias("__img"))
    # NULL op must not silently delete the key: isin() is NULL for a
    # NULL operand and where() drops NULL — treat a malformed
    # (op-less) latest image as an upsert, never a delete.
    alive = latest.where(
        F.coalesce(~F.col(f"__img.{op}").isin(list(delete_ops)), F.lit(True))
    )
    out_cols = carried if keep_meta else payload
    return alive.select(*keys, *[F.col(f"__img.{c}").alias(c) for c in out_cols])


def cdc_deduplicate_log(
    changelog: DataFrame,
    keys: str | Sequence[str],
    ts: str,
    tiebreak: str | None = None,
    attrs: Sequence[str] | None = None,
) -> DataFrame:
    """Drop consecutive per-key events whose tracked attributes did not
    change (CDC sources frequently re-emit unchanged images on
    heartbeat/snapshot boundaries). Keeps the first of each run.
    One shuffle+sort on the key (a lag() window); use before
    scd2_history to avoid zero-length intervals, or before
    cdc_compact purely to shrink audit output — compaction itself
    never needs it."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    from pyspark.sql import Window

    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    attrs = list(attrs) if attrs is not None else [
        c for c in changelog.columns
        if c not in keys and c != ts and c != tiebreak
    ]
    is_first = F.lag(F.lit(1)).over(w).isNull()
    # Empty attrs (changelog of bare keys+ts) gets defined keep-first
    # semantics instead of `is_first | None` leaking through py4j.
    differs = F.lit(False)
    for a in attrs:
        differs = differs | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
    return (
        changelog.withColumn("__keep", is_first | differs)
        .filter("__keep")
        .drop("__keep")
    )
