"""Event time — reference examples/event_time.rs (monthly balances
that EMIT when the watermark passes month end, fire-and-evict) and
event_time_out_of_order.rs (bounded disorder; late records divert to
a side stream instead of silently dropping)."""

from datetime import datetime

from pyspark.sql import functions as F

from malstrom_spark.sources import iterator_source
from malstrom_spark.stream import Stream
from malstrom_spark.streaming.stateful_op import stateful_op_stream


def monthly_balances(spark, tmp_dir):
    """The reference's flagship event-time program: per-account
    balances emit only when the watermark crosses the month boundary
    (event_time.rs:94-152) — here on the real streaming engine with
    event-time timers."""
    import pandas as pd

    def on_data(key, pdfs, state, timer_values):
        month = state[0] if state else None
        total = state[1] if state else 0.0
        end_ms = None
        for pdf in pdfs:
            ts = pdf["ts"].iloc[0]
            month = month or ts.strftime("%Y-%m")
            end_ms = int(((ts.to_period("M") + 1).to_timestamp()).timestamp() * 1000)
            total += float(pdf["amount"].sum())
        return [], (month, total), ([end_ms] if end_ms else [])

    def on_timer(key, fired_at_ms, state):
        if state is None:
            return [], None, []
        out = pd.DataFrame(
            {"account": [key[0]], "month": [state[0]], "balance": [state[1]]}
        )
        return [out], None, []  # emit + evict, like the reference

    staging = f"{tmp_dir}/in"
    schema = "account string, ts timestamp, amount double"
    jan = [("a", datetime(2024, 1, 5), 10.0), ("a", datetime(2024, 1, 20), 5.0)]
    mar = [("z", datetime(2024, 3, 1), 1.0)]  # pushes the watermark past Jan
    spark.createDataFrame(jan, schema).coalesce(1).write.parquet(f"{staging}/b0")
    spark.createDataFrame(mar, schema).coalesce(1).write.parquet(f"{staging}/b1")
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{staging}/b*")
        .withWatermark("ts", "0 seconds")
    )
    out = stateful_op_stream(
        sdf, ["account"], on_data, on_timer,
        output_schema="account string, month string, balance double",
        state_schema="month string, total double",
    )
    q = (
        out.writeStream.format("memory").queryName("example_monthly")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = {(r.account, r.month): r.balance for r in spark.table("example_monthly").collect()}
    assert rows == {("a", "2024-01"): 15.0}, rows  # March never closes
    return rows


def out_of_order(spark):
    """Bounded disorder: arrival order 5..9 then 0..4 — everything in
    the second burst is behind the frontier and diverts to the late
    stream (generate_epochs.rs:44 stream pair; single-worker frontier
    mirrors the single-threaded reference example)."""
    vals = list(range(5, 10)) + list(range(5))
    src = iterator_source(spark, vals, "v long")
    s = Stream.from_df(src).assign_timestamps(F.timestamp_seconds(F.col("v")), "ts")
    on_time, late = s.split_late("INTERVAL 0 SECONDS", ["seq"], n_shards=1)
    assert sorted(r.v for r in on_time.collect()) == [5, 6, 7, 8, 9]
    assert sorted(r.v for r in late.collect()) == [0, 1, 2, 3, 4]
    return {"late": 5}


def main(spark, tmp_dir="/tmp/malstrom_example_event_time"):
    import shutil

    shutil.rmtree(tmp_dir, ignore_errors=True)
    balances = monthly_balances(spark, tmp_dir)
    late = out_of_order(spark)
    return {"balances": balances, **late}


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="example-event-time")))
