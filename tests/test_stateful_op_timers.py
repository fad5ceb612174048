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
        return [out], None  # emit + evict, fire-on-time-passing semantics

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
