"""Snapshot recovery — reference examples/slatedb_backend.rs and
slatedb_backend_failing.rs: run a stateful job, stop it mid-input,
restart from the checkpoint, and prove state is EXACTLY-ONCE — every
record counted once, none lost, none double-counted."""

import shutil

from pyspark.sql import functions as F

from malstrom_spark.streaming.stateful import running_totals_stream


def main(spark, tmp_dir="/tmp/malstrom_example_recovery"):
    shutil.rmtree(tmp_dir, ignore_errors=True)
    src, ckpt, out_dir = f"{tmp_dir}/in", f"{tmp_dir}/ckpt", f"{tmp_dir}/out"
    schema = "user_id long, value double"
    # two input files = two microbatches with maxFilesPerTrigger=1
    spark.createDataFrame(
        [(i % 5, 1.0) for i in range(50)], schema
    ).coalesce(1).write.parquet(f"{src}/b0")

    def run():
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

    run()  # first run consumes b0, snapshots offsets + state

    # 'failure window': more data lands, then the job is restarted
    spark.createDataFrame(
        [(i % 5, 1.0) for i in range(25)], schema
    ).coalesce(1).write.parquet(f"{src}/b1")
    run()  # resumes from the checkpoint — b0 is NOT re-read

    final = (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n"))
    )
    got = {r.user_id: r.n for r in final.collect()}
    assert got == {0: 15, 1: 15, 2: 15, 3: 15, 4: 15}, got  # 75 events once each
    return {"per_key_events": got}


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="example-recovery")))
