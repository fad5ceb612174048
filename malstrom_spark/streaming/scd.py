"""Streaming SCD2 — the stateful-streaming twin of
operators/scd.py, on the same applyInPandasWithState wrapper as
stateful_map (streaming/stateful.py; reference `StatefulLogic`
contract, operators/stateful_map.rs:60-110).

State per key = the OPEN interval: the tracked attribute values and
their valid_from. Each microbatch sorts its events per key, detects
change points vectorized (null-safe shift-compare, no Python row
loop), EMITS every interval the batch closes (valid_to set,
is_current False) plus the key's current open interval (valid_to
null, is_current True), and stores the open interval back to state —
CDC-style incremental history.

Cross-microbatch contract: append mode cannot retract, so an open
row emitted in batch N is superseded (not deleted) when batch N+1
closes it; downstream consumers keep the LATEST row per
(key, valid_from) — with the bounded availableNow replay (one batch)
the emitted set equals the batch operator exactly (parity test).
Exactness needs event time to not regress across microbatches, the
same arrival-order contract as streaming/funnel.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType, TimestampType


def scd2_stream(
    sdf: DataFrame,
    key: str,
    ts: str,
    attrs: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Streaming SCD2 over a streaming DataFrame: emits
    (key, attrs..., valid_from, valid_to, is_current) rows as
    intervals close, plus the open interval per touched key."""
    import pandas as pd

    from .stateful import require_utc_session, stateful_map_stream

    attrs = list(attrs)
    if not attrs:
        raise ValueError("attrs must be non-empty: SCD2 tracks at least one attribute")
    require_utc_session(sdf, "scd2_stream")
    cols = [key, ts] + attrs + ([tiebreak] if tiebreak else [])
    ev = sdf.select(*cols)

    out_schema = StructType(
        [ev.schema[key]]
        + [ev.schema[a] for a in attrs]
        + [
            StructField("valid_from", TimestampType()),
            StructField("valid_to", TimestampType()),
            StructField("is_current", BooleanType()),
        ]
    )
    # state = the open interval: attr values + valid_from
    state_schema = StructType(
        [ev.schema[a] for a in attrs] + [StructField("__from", TimestampType())]
    )

    def fn(k, pdfs, state):
        pdf = pd.concat(list(pdfs), ignore_index=True)
        sort_keys = [ts] + ([tiebreak] if tiebreak else [])
        pdf = pdf.sort_values(sort_keys, kind="mergesort", ignore_index=True)

        frames = [pdf[attrs + [ts]].rename(columns={ts: "__from"})]
        if state is not None:
            head = pd.DataFrame([dict(zip(attrs, state[:-1]), __from=state[-1])])
            frames.insert(0, head)
        seq = pd.concat(frames, ignore_index=True)

        # vectorized change detection: null-safe compare to the
        # previous row across all tracked attrs
        changed = None
        for a in attrs:
            col, prev = seq[a], seq[a].shift()
            d = (col != prev) & ~(col.isna() & prev.isna())
            changed = d if changed is None else (changed | d)
        changed.iloc[0] = True
        groups = seq[changed].reset_index(drop=True)

        out = groups[attrs].copy()
        out.insert(0, key, k[0])
        out["valid_from"] = groups["__from"]
        out["valid_to"] = groups["__from"].shift(-1)
        out["is_current"] = out["valid_to"].isna()

        last = groups.iloc[-1]
        new_state = tuple(last[a] for a in attrs) + (last["__from"],)
        return [out], new_state

    return stateful_map_stream(ev, [key], fn, out_schema, state_schema)


def consolidate_scd2(
    emitted: DataFrame, key: str, attrs: Sequence[str]
) -> DataFrame:
    """Collapse the append-mode emission log of `scd2_stream` to the
    CURRENT history: the stream supersedes (never deletes) an open row
    when a later batch closes it, so a multi-microbatch replay leaves
    both versions in the sink — required before comparing against the
    batch operator whenever the replay may produce more than one
    microbatch.

    Exact without an emission-order column because valid_to transitions
    exactly once (null while open -> the close timestamp, never
    revised): max(valid_to) per (key, attrs, valid_from) ignores the
    null open-version and recovers the latest row; is_current is
    re-derived from the surviving valid_to."""
    from pyspark.sql import functions as F

    return (
        emitted.groupBy(F.col(key), *[F.col(a) for a in attrs], F.col("valid_from"))
        .agg(F.max("valid_to").alias("valid_to"))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
