"""Hello, streaming — reference examples/look_ma_im_streaming.rs: an
unbounded generator source (the StatelessSource analog) feeding a
live query; we let a few microbatches run, then stop and look at what
arrived."""

import time

from pyspark.sql import functions as F

from malstrom_spark.sources import rate_stream


def main(spark):
    sdf = rate_stream(spark, rows_per_second=500)
    shaped = sdf.select(
        F.col("timestamp"), (F.col("value") % 10).alias("digit")
    )
    q = (
        shaped.writeStream.format("memory")
        .queryName("example_rate")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and spark.table("example_rate").count() < 100:
            time.sleep(0.5)
    finally:
        q.stop()
    n = spark.table("example_rate").count()
    assert n >= 100, f"rate source produced only {n} rows"
    return {"rows_streamed": n}


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="example-rate")))
