"""Streaming funnel — the stateful-streaming twin of
operators/funnel.py, built on the same applyInPandasWithState wrapper
as stateful_map (streaming/stateful.py; reference `StatefulLogic`
contract, operators/stateful_map.rs:60-110).

State per user = the K chain timestamps (epoch micros, null = prefix
not yet completed). Each microbatch applies the same min()-chaining
semantics as the batch operator, VECTORIZED per key: K numpy masked
mins over the batch's events instead of a Python row loop —
t_k = min ts among events matching step k with ts > t_{k-1} and
ts <= t_0 + within. Within one microbatch this is exactly the batch
fold (tests/test_funnel.py pin; the registry query's oracle is the
same min()-chained SQL as the batch query's).

Cross-microbatch contract: t_k only ever fills forward (a set chain
time is never revised), so results are exact when event time does not
regress across microbatches — the same arrival-order contract the
reference's stateful_map user logic lives under (closures see arrival
order; stateful_map.rs:74-77). With the bounded availableNow replay
(one batch) the output equals the batch operator exactly. For true
out-of-order streams, bound disorder with limit_out_of_orderness and
buffer within the horizon upstream (streaming/eventtime.py) before
this operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, TimestampType


_UNIT_US = {
    "microsecond": 1, "millisecond": 1_000, "second": 1_000_000,
    "minute": 60_000_000, "hour": 3_600_000_000, "day": 86_400_000_000,
    "week": 604_800_000_000,
}


def _interval_micros(sdf: DataFrame, within: str) -> int:
    """'<n> <unit>' intervals resolve in Python (no job at plan
    construction); anything fancier falls back to one engine-side
    evaluation of the INTERVAL literal."""
    parts = within.strip().lower().split()
    if len(parts) == 2 and parts[1].rstrip("s") in _UNIT_US:
        try:
            return int(float(parts[0]) * _UNIT_US[parts[1].rstrip("s")])
        except ValueError:
            pass
    return (
        sdf.sparkSession.range(1)
        .select(
            F.unix_micros(
                F.lit(0).cast("timestamp") + F.expr(f"INTERVAL {within}")
            ).alias("us")
        )
        .collect()[0]
        .us
    )


def funnel_stream(
    sdf: DataFrame,
    user: str,
    ts: str,
    steps: Sequence[tuple[str, Column]],
    within: str | None = None,
) -> DataFrame:
    """Per-user funnel chain times over a streaming DataFrame: emits
    (user, t_<step>...) with the chain-so-far after every microbatch
    that touched the user. steps/within as in funnel_times."""
    import numpy as np
    import pandas as pd

    from .stateful import require_utc_session, stateful_map_stream

    names = [n for n, _ in steps]
    if not names:
        raise ValueError("steps must be non-empty")
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate step names: {names}")
    require_utc_session(sdf, "funnel_stream")
    from ..operators.funnel import _check_within

    _check_within(within)
    k = len(steps)
    within_us = None if within is None else _interval_micros(sdf, within)

    any_step = None
    for _, p in steps:
        any_step = p if any_step is None else (any_step | p)
    # null event times can't order in a chain; both twins drop them
    ev = sdf.filter(any_step & F.col(ts).isNotNull()).select(
        F.col(user).alias("u"),
        F.unix_micros(F.col(ts)).alias("e_us"),
        *[p.cast("boolean").alias(f"f{i}") for i, (_, p) in enumerate(steps)],
    )

    out_schema = StructType(
        [StructField("u", ev.schema["u"].dataType)]
        + [StructField(f"t_{n}", TimestampType()) for n in names]
    )
    state_schema = StructType([StructField(f"t{i}", LongType()) for i in range(k)])

    def fn(key, pdfs, state):
        t = list(state) if state is not None else [None] * k
        pdf = pd.concat(list(pdfs), ignore_index=True)
        e = pdf["e_us"].to_numpy(dtype="int64")
        for i in range(k):
            if t[i] is not None:
                continue  # chain times only fill forward
            mask = pdf[f"f{i}"].fillna(False).to_numpy(dtype=bool)
            if i > 0:
                if t[i - 1] is None:
                    break  # no prefix -> later steps can't fill either
                mask &= e > t[i - 1]
                if within_us is not None:
                    mask &= e <= t[0] + within_us
            if mask.any():
                t[i] = int(e[mask].min())
        row = {"u": key[0]}
        for i, n in enumerate(names):
            row[f"t_{n}"] = (
                pd.Timestamp(t[i], unit="us") if t[i] is not None else pd.NaT
            )
        return [pd.DataFrame([row])], tuple(t)

    return stateful_map_stream(ev, ["u"], fn, out_schema, state_schema)
