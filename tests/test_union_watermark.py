"""Multi-input watermark parity (SURVEY §2.4 union / hard part #4):
the reference min-merges epochs across unioned inputs so the
watermark never overtakes the slower stream (channels/
operator_io.rs:164-177,256-268). Spark's global watermark policy
defaults to `min` across inputs — this test pins that behavior: a
unioned windowed aggregation in APPEND mode may only emit windows
closed under the SLOWER input's watermark, even though the faster
input has advanced far beyond them.
"""

import pathlib
from datetime import datetime, timezone

from pyspark.sql import functions as F


def _t(s):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def _write(spark, path: pathlib.Path, rows):
    spark.createDataFrame(rows, "event_id long, ts timestamp").coalesce(1).write.parquet(
        str(path)
    )


def test_union_watermark_is_min_of_inputs(spark, tmp_path):
    assert (
        spark.conf.get("spark.sql.streaming.multipleWatermarkPolicy", "min") == "min"
    )

    slow_dir, fast_dir = tmp_path / "slow", tmp_path / "fast"
    # slow input reaches ts=95s; fast input reaches ts=1000s
    _write(spark, slow_dir, [(i, _t(60 + i)) for i in range(36)])  # 60..95
    _write(spark, fast_dir, [(100 + i, _t(900 + i * 10)) for i in range(11)])  # 900..1000

    schema = "event_id long, ts timestamp"
    slow = spark.readStream.schema(schema).parquet(str(slow_dir)).withWatermark("ts", "0 seconds")
    fast = spark.readStream.schema(schema).parquet(str(fast_dir)).withWatermark("ts", "0 seconds")

    unioned = slow.union(fast)
    agg = unioned.groupBy(F.window("ts", "10 seconds")).agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.format("memory")
        .queryName("union_wm")
        .outputMode("append")  # append emits ONLY watermark-closed windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted_ends = [
        r.end for r in spark.table("union_wm").select(F.col("window.end").alias("end")).collect()
    ]

    # watermark = min(95, 1000) = 95s -> windows ending <= 95s may emit
    # ([60,70) [70,80) [80,90)); the fast input's 900..1000s windows and
    # the still-open [90,100) window must be withheld
    assert emitted_ends, "no windows emitted — watermark never advanced"
    # nothing from the fast stream's 900..1000s range, nothing open
    assert max(emitted_ends) <= _t(95)
    assert sorted(emitted_ends) == [_t(70), _t(80), _t(90)]
