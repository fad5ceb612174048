"""Rescaling — reference examples/rescaling.rs and multithreading.rs:
the same keyed job resumes from its checkpoint under a DIFFERENT
parallelism and produces identical totals (the reference moves state
between workers with its Interrogate/Collect/Acquire protocol; Spark
rebinds state-store partitions from the checkpoint)."""

import shutil

from pyspark.sql import functions as F

from malstrom_spark.streaming.stateful import running_totals_stream


def main(spark, tmp_dir="/tmp/malstrom_example_rescale"):
    shutil.rmtree(tmp_dir, ignore_errors=True)
    src, ckpt, out_dir = f"{tmp_dir}/in", f"{tmp_dir}/ckpt", f"{tmp_dir}/out"
    schema = "user_id long, value double"
    spark.createDataFrame(
        [(i % 8, float(i)) for i in range(80)], schema
    ).coalesce(1).write.parquet(f"{src}/b0")

    def run(shuffle_partitions):
        # spark.sql.shuffle.partitions is read at query START for a NEW
        # checkpoint; on restart the state layout comes from the
        # checkpoint and Spark maps it onto the new task set.
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/b*")
        )
        q = (
            running_totals_stream(sdf, "user_id", "value")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        run(4)  # 'four workers'
        spark.createDataFrame(
            [(i % 8, float(i)) for i in range(40)], schema
        ).coalesce(1).write.parquet(f"{src}/b1")
        run(16)  # rescaled to 'sixteen workers', same checkpoint
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")

    final = (
        spark.read.parquet(out_dir).groupBy("user_id").agg(F.max("n_events").alias("n"))
    )
    got = {r.user_id: r.n for r in final.collect()}
    assert got == {k: 15 for k in range(8)}, got  # 120 records, counted once
    return {"per_key_events": got}


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="example-rescale")))
