"""Event-time TTL eviction: a key idle past its TTL relative to the
WATERMARK loses its state when the watermark passes (epoch-driven
expiry — not wall clock). A later record for the key then starts
fresh. Timers only fire in a batch where the key has no data, so the
sequence interleaves a second key to advance the watermark.
"""

from datetime import datetime, timezone


def test_event_time_ttl_evicts_idle_key(spark, tmp_path):
    import pandas as pd

    from malstrom_spark.streaming.stateful import ttl_map_event_stream

    def counting(key, pdfs, state):
        n = state[0] if state else 0
        for pdf in pdfs:
            n += len(pdf)
        out = pd.DataFrame({"k": [key[0]], "n": [n]})
        return [out], (n,)

    t = lambda s: datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)  # noqa: E731
    staging = tmp_path / "in"
    staging.mkdir()
    schema = "k string, ts timestamp"
    batches = [
        [("A", t(100))],   # A: state n=1, ttl timer at 100+10=110s
        [("B", t(5000))],  # watermark -> 5000s (far past A's 110s)
        [("B", t(5002))],  # A has no data here -> its TTL fires, state dropped
        [("A", t(5003))],  # A returns: must start fresh at n=1
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(staging / f"b{i}"))

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(staging) + "/b*")
        .withWatermark("ts", "0 seconds")
    )
    out = ttl_map_event_stream(
        sdf, ["k"], counting, output_schema="k string, n long",
        state_schema="n long", ttl_ms=10_000,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ttl_et")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [(r.k, r.n) for r in spark.table("ttl_et").collect()]
    a_counts = sorted(n for k, n in rows if k == "A")
    b_counts = sorted(n for k, n in rows if k == "B")
    assert a_counts == [1, 1], rows  # second visit restarted — state was evicted
    assert b_counts == [1, 2], rows  # B stayed within TTL, state survived
