"""inspect_frontier parity: observe watermark progress from a
listener — the engine-provided analog of a frontier-observing
pass-through operator."""

import time
from datetime import datetime

from pyspark.sql import functions as F

from malstrom_spark.operators.eventtime import inspect_frontier_listener


def test_frontier_listener_sees_watermark_advance(spark, tmp_path):
    seen = []
    listener = inspect_frontier_listener(seen.append)
    spark.streams.addListener(listener)
    try:
        rows = [(i, datetime(2024, 1, 1, 12, 0, i)) for i in range(30)]
        src = str(tmp_path / "src")
        spark.createDataFrame(rows, "id long, ts timestamp").write.parquet(src)
        sdf = (
            spark.readStream.schema("id long, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .withWatermark("ts", "5 seconds")
        )
        agg = sdf.groupBy(F.window("ts", "10 seconds")).agg(F.count(F.lit(1)).alias("n"))
        q = (
            agg.writeStream.format("memory")
            .queryName("frontier_smoke")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener callbacks are async; give the bus a moment to drain
        deadline = time.time() + 45
        while time.time() < deadline and not any(w != "1970-01-01T00:00:00.000Z" for w in seen):
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    advanced = [w for w in seen if w and not w.startswith("1970")]
    assert advanced, f"watermark never advanced in listener: {seen}"
    # final watermark = max ts (12:00:29) - 5s bound = 12:00:24
    assert any(w.startswith("2024-01-01T12:00:24") for w in advanced), advanced
