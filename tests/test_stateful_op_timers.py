"""Watermark-fired stateful logic: the monthly-balance program —
per-account balances accumulate in keyed state and EMIT when the
watermark passes month end (fire-and-evict on time passing, not on
data arrival). Data for a month arrives in early batches; the
emission may only appear after a later batch's records push the
watermark past the month boundary.

NOTE: the logic callables are defined INSIDE the test so cloudpickle
serializes them by value — module-level functions in a test module
pickle by reference, which Python workers cannot import.
"""

from datetime import datetime

import pytest

from malstrom_spark.streaming.stateful_op import stateful_op_stream


def test_monthly_balance_fires_on_watermark(spark, tmp_path):
    import pandas as pd

    def month_and_end_ms(ts: pd.Timestamp):
        nxt = (ts.to_period("M") + 1).to_timestamp()
        return ts.strftime("%Y-%m"), int(nxt.timestamp() * 1000)

    def on_data(key, pdfs, state, timer_values):
        total = state[1] if state else 0.0
        month = state[0] if state else None
        end_ms = None
        for pdf in pdfs:
            m, end = month_and_end_ms(pdf["ts"].iloc[0])
            month = month or m
            end_ms = end
            total += float(pdf["amount"].sum())
        return [], (month, total), ([end_ms] if end_ms else [])

    def on_timer(key, fired_at_ms, state):
        if state is None:
            return [], None
        month, total = state
        out = pd.DataFrame({"account": [key[0]], "month": [month], "balance": [total]})
        return [out], None, []  # emit + evict, fire-on-time-passing semantics

    staging = tmp_path / "in"
    staging.mkdir()
    jan = [
        ("acct_a", datetime(2024, 1, 5), 10.0),
        ("acct_a", datetime(2024, 1, 20), 5.0),
        ("acct_b", datetime(2024, 1, 7), 100.0),
    ]
    # distinct key: pushes the watermark past Jan without mixing months
    mar = [("acct_c", datetime(2024, 3, 10), 1.0)]
    schema = "account string, ts timestamp, amount double"
    spark.createDataFrame(jan, schema).coalesce(1).write.parquet(str(staging / "b0"))
    spark.createDataFrame(mar, schema).coalesce(1).write.parquet(str(staging / "b1"))

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(staging) + "/b*")
        .withWatermark("ts", "0 seconds")
    )
    out = stateful_op_stream(
        sdf,
        ["account"],
        on_data,
        on_timer,
        output_schema="account string, month string, balance double",
        state_schema="month string, total double",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("monthly_balance")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r.account, r.month): r.balance for r in spark.table("monthly_balance").collect()}

    # January balances emitted exactly once per key, fired by the
    # watermark (March data) crossing Feb 1 — not by any January batch
    assert rows[("acct_a", "2024-01")] == pytest.approx(15.0)
    assert rows[("acct_b", "2024-01")] == pytest.approx(100.0)
    # acct_c's March month-end was never passed by the watermark ->
    # still in state, not emitted (eviction happens only in on_timer)
    assert ("acct_c", "2024-03") not in rows
    assert len(rows) == 2


def test_on_timer_rearm_fires_later_window(spark, tmp_path):
    """A key holding TWO open windows whose ends the watermark passes
    in separate microbatches must emit both — the second only via the
    timer re-armed from on_timer (the key never sees data again).
    Regression: before on_timer could re-arm, the later window stayed
    unemitted until new data happened to arrive for the key."""
    import pandas as pd

    DAY_MS = 86_400_000

    def day_end_ms(day):
        return int(pd.Timestamp(day).timestamp() * 1000) + DAY_MS

    def on_data(key, pdfs, state, timer_values):
        days, totals = (list(state[0]), list(state[1])) if state else ([], [])
        for pdf in pdfs:
            for day, grp in pdf.groupby(pdf["ts"].dt.strftime("%Y-%m-%d")):
                if day in days:
                    totals[days.index(day)] += float(grp["amount"].sum())
                else:
                    days.append(day)
                    totals.append(float(grp["amount"].sum()))
        return [], (days, totals), [min(day_end_ms(d) for d in days)]

    def on_timer(key, fired_at_ms, state):
        if state is None:
            return [], None, []
        days, totals = list(state[0]), list(state[1])
        closed = [i for i, d in enumerate(days) if day_end_ms(d) <= fired_at_ms]
        if not closed:
            return [], state, [min(day_end_ms(d) for d in days)]
        out = pd.DataFrame(
            {
                "account": [key[0]] * len(closed),
                "day": [days[i] for i in closed],
                "total": [totals[i] for i in closed],
            }
        )
        keep = [i for i in range(len(days)) if i not in closed]
        if not keep:
            return [out], None, []
        return [out], ([days[i] for i in keep], [totals[i] for i in keep]), [
            min(day_end_ms(days[i]) for i in keep)
        ]

    staging = tmp_path / "in"
    staging.mkdir()
    schema = "account string, ts timestamp, amount double"
    # b0: acct_a has data on day 1 AND day 2 (two open windows)
    b0 = [
        ("acct_a", datetime(2024, 1, 1, 10), 1.0),
        ("acct_a", datetime(2024, 1, 2, 10), 2.0),
    ]
    # b1: other key pushes watermark past end of day 1 only
    b1 = [("acct_z", datetime(2024, 1, 2, 12), 0.0)]
    # b2: other key pushes watermark past end of day 2; acct_a silent
    b2 = [("acct_z", datetime(2024, 1, 5), 0.0)]
    for i, batch in enumerate([b0, b1, b2]):
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(
            str(staging / f"b{i}")
        )

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(staging) + "/b*")
        .withWatermark("ts", "0 seconds")
    )
    out = stateful_op_stream(
        sdf,
        ["account"],
        on_data,
        on_timer,
        output_schema="account string, day string, total double",
        state_schema="days array<string>, totals array<double>",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("rearm_days")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.account, r.day): r.total for r in spark.table("rearm_days").collect()
    }
    assert rows[("acct_a", "2024-01-01")] == pytest.approx(1.0)
    # the re-armed timer must close day 2 with no further acct_a data
    assert rows[("acct_a", "2024-01-02")] == pytest.approx(2.0)
