"""Streaming corpus ingestion: documents arrive on a message-bus
topic, pass a quality/language gate, deduplicate exactly across
microbatches with engine-managed key state, and land on an output
topic — the ingestion-side half of the training-data pipeline, run
as an actual STREAM (the reference's identity: the same dataflow
program processes bounded and unbounded input, README.md:1-6).

Composes: sources/bus.py (jar-free Kafka-contract twin) ->
functions/text.py quality/lang gates -> streaming dropDuplicates
(at 100 TB: dropDuplicatesWithinWatermark to bound state by the
lateness horizon) -> bus_sink producer."""

import json
import shutil

from pyspark.sql import functions as F

from malstrom_spark.functions import text
from malstrom_spark.sources.bus import (
    bus_produce,
    bus_sink,
    register_message_bus_source,
)


def main(spark, tmp_dir="/tmp/malstrom_example_ingest"):
    shutil.rmtree(tmp_dir, ignore_errors=True)
    bus = f"{tmp_dir}/bus"

    # crawler output arrives as (doc_id, text) messages; epoch 1
    # re-sends half of epoch 0 (at-least-once upstream = duplicates)
    docs = [
        (i, f"document number {i} has plenty of ordinary english words here.")
        for i in range(40)
    ] + [(i, "zzz qqq xxx") for i in range(40, 50)]  # garble -> gated out
    rows = [(str(i), json.dumps({"doc_id": i, "text": t})) for i, t in docs]
    df = spark.createDataFrame(rows, "key string, value string")
    bus_produce(df, bus, "crawl", epoch_id=0)
    bus_produce(df.limit(20), bus, "crawl", epoch_id=1)  # duplicate resend

    register_message_bus_source(spark)
    raw = (
        spark.readStream.format("malstrom_bus")
        .option("path", bus)
        .option("topic", "crawl")
        .load()
    )
    parsed = raw.select(
        F.get_json_object("value", "$.doc_id").cast("long").alias("doc_id"),
        F.get_json_object("value", "$.text").alias("text"),
    )
    # quality gate: drop garble (high non-word ratio / tiny vocab);
    # same Column exprs as the batch pipeline — one definition, both modes
    gated = parsed.where(
        (text.token_count(F.col("text")) >= 5)
        & (text.stopword_ratio(F.col("text")) > 0)
    )
    # exact dedup across microbatches: doc_id key state drops the
    # epoch-1 resends even though they arrive in a later batch
    deduped = gated.dropDuplicates(["doc_id"])
    out = deduped.select(
        F.col("doc_id").cast("string").alias("key"), F.col("text").alias("value")
    )
    q = bus_sink(out, bus, "clean", f"{tmp_dir}/ckpt", trigger_available_now=True)
    q.awaitTermination()

    # verify: read the clean topic back — 40 good docs, exactly once
    check = (
        spark.readStream.format("malstrom_bus")
        .option("path", bus)
        .option("topic", "clean")
        .load()
    )
    qc = (
        check.writeStream.format("memory")
        .queryName("ingest_example")
        .option("checkpointLocation", f"{tmp_dir}/ckpt2")
        .start()
    )
    qc.processAllAvailable()
    qc.stop()
    qc.awaitTermination()
    got = spark.sql("select * from ingest_example").collect()
    keys = sorted(int(r.key) for r in got)
    assert keys == list(range(40)), keys  # gated garble out, dups dropped
    return {"clean_docs": len(got)}


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="example-ingest")))
