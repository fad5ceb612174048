"""Custom operator escape hatches — reference
examples/custom_stateful_operator.rs (arbitrary StatefulLogic with
epoch reaction) and ttl_map_example.rs (state entries that expire on
the event-time frontier)."""

from datetime import datetime

from pyspark.sql import functions as F

from malstrom_spark.operators.stateful import ttl_map
from malstrom_spark.sources import iterator_source


def custom_stateful(spark, tmp_dir):
    """A dedupe-within-key operator built on the general stateful_op
    surface (custom_stateful_operator.rs shape): per-key seen-set in
    state, first occurrence passes, repeats drop."""
    import pandas as pd

    from malstrom_spark.streaming.stateful_op import stateful_op_stream

    def on_data(key, pdfs, state, timer_values):
        seen = set(state[0]) if state else set()
        outs = []
        for pdf in pdfs:
            fresh = pdf[~pdf["token"].isin(seen)].drop_duplicates("token")
            seen.update(fresh["token"].tolist())
            if len(fresh):
                outs.append(pd.DataFrame({"k": fresh["k"], "token": fresh["token"]}))
        return outs, (sorted(seen),), []

    def on_timer(key, fired_at_ms, state):
        return [], state, []

    schema = "k string, ts timestamp, token string"
    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, i), t)
        for i, t in enumerate(["x", "y", "x", "z", "y"])
    ]
    staging = f"{tmp_dir}/dedup_in"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staging)
    sdf = spark.readStream.schema(schema).parquet(staging).withWatermark("ts", "0 seconds")
    out = stateful_op_stream(
        sdf, ["k"], on_data, on_timer,
        output_schema="k string, token string",
        state_schema="seen array<string>",
    )
    q = (
        out.writeStream.format("memory").queryName("example_custom_op")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    toks = sorted(r.token for r in spark.table("example_custom_op").collect())
    assert toks == ["x", "y", "z"], toks
    return toks


def ttl_example(spark):
    """ttl_map_example.rs: per-key state entries expire when the
    event-time frontier passes their deadline — a 2-second-TTL
    session counter over a batch replay (entries carry their expiry,
    ExpireMap-style)."""
    from datetime import timedelta

    rows = [("a", 0, 1), ("a", 1, 1), ("a", 10, 1), ("b", 0, 1)]
    src = iterator_source(spark, rows, "k string, t long, v long")

    def fn(key, row, live):
        n = live.get("n", (None, 0))[1] + row["v"]
        expiry = row["ts"] + timedelta(seconds=2)
        return {"k": key[0], "t": row["t"], "n_in_session": n}, {"n": (expiry, n)}

    out = ttl_map(
        src.withColumn("ts", F.timestamp_seconds("t")),
        ["k"],
        ["t"],
        "ts",
        ttl=timedelta(seconds=2),
        fn=fn,
        schema="k string, t long, n_in_session long",
    )
    got = {(r.k, r.t): r.n_in_session for r in out.collect()}
    # a's third event arrives 9s after the second: state expired, count resets
    assert got[("a", 0)] == 1 and got[("a", 1)] == 2 and got[("a", 10)] == 1
    assert got[("b", 0)] == 1
    return got


def main(spark, tmp_dir="/tmp/malstrom_example_custom"):
    import shutil

    shutil.rmtree(tmp_dir, ignore_errors=True)
    toks = custom_stateful(spark, tmp_dir)
    ttl = ttl_example(spark)
    return {"dedup_tokens": toks, "ttl_rows": len(ttl)}


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="example-custom")))
