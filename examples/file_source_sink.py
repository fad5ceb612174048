"""File source -> transform -> file sink with exactly-once commit —
reference examples/file_source_stateful.rs, file_source_stateless.rs,
file_sink_stateful.rs, file_sink_stateless.rs: per-partition offsets
live in the checkpoint (the reference's persisted line numbers), and
the parquet sink commits atomically per microbatch."""

import shutil

from pyspark.sql import functions as F

from malstrom_spark.sinks import parquet_sink
from malstrom_spark.sources import file_stream


def main(spark, tmp_dir="/tmp/malstrom_example_filesrc"):
    shutil.rmtree(tmp_dir, ignore_errors=True)
    src, out, ckpt = f"{tmp_dir}/in", f"{tmp_dir}/out", f"{tmp_dir}/ckpt"
    schema = "line_no long, body string"
    rows = [(i, f"line number {i}") for i in range(100)]
    spark.createDataFrame(rows, schema).coalesce(4).write.parquet(src)

    sdf = file_stream(spark, src, schema, max_files_per_trigger=2)
    shouting = sdf.select("line_no", F.upper("body").alias("body"))
    q = parquet_sink(shouting, out, ckpt, trigger_available_now=True)
    q.awaitTermination()

    got = spark.read.parquet(out)
    assert got.count() == 100
    assert got.filter(~F.col("body").startswith("LINE")).count() == 0
    return {"written": got.count()}


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="example-files")))
