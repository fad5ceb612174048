"""Direct coverage for the source/sink builders (SURVEY §2.6/2.7) —
each builder is thin by design (the engine owns partitioning/offsets),
so the tests assert the contract: schema, boundedness/streaming flags,
and data arrival end-to-end."""

import time

from pyspark.sql import functions as F

from malstrom_spark import sinks, sources


def test_iterator_source_sequence_timestamps(spark):
    df = sources.iterator_source(spark, [10, 20, 30], "v int")
    rows = sorted((r.seq, r.v) for r in df.collect())
    # timestamp = element index, the reference's ts = i convention
    assert rows == [(0, 10), (1, 20), (2, 30)]


def test_parquet_table_prunes_columns(spark, sf_dir):
    df = sources.parquet_table(spark, sf_dir, "nation").select("n_name")
    assert df.count() == 25
    assert [f.name for f in df.schema.fields] == ["n_name"]


def test_file_stream_is_streaming_and_delivers(spark, sf_dir, tmp_path):
    batch = sources.parquet_table(spark, sf_dir, "region")
    src_dir = str(tmp_path / "stream_src")
    batch.write.parquet(src_dir)
    sdf = sources.file_stream(spark, src_dir, batch.schema, max_files_per_trigger=1)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("file_stream_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("file_stream_smoke").count() == batch.count()


def test_rate_stream_emits(spark):
    sdf = sources.rate_stream(spark, rows_per_second=100)
    assert sdf.isStreaming
    assert [f.name for f in sdf.schema.fields] == ["timestamp", "value"]
    q = sinks.memory_sink(sdf, "rate_smoke")
    try:
        deadline = time.time() + 45
        while time.time() < deadline and spark.table("rate_smoke").count() == 0:
            time.sleep(0.5)
        assert spark.table("rate_smoke").count() > 0
    finally:
        q.stop()


def test_foreach_batch_sink_receives_batches(spark, sf_dir, tmp_path):
    batch = sources.parquet_table(spark, sf_dir, "nation")
    src_dir = str(tmp_path / "fb_src")
    batch.write.parquet(src_dir)
    sdf = sources.file_stream(spark, src_dir, batch.schema)
    seen = []

    def collect_counts(bdf, epoch_id):
        seen.append((epoch_id, bdf.count()))

    q = sinks.foreach_batch_sink(
        sdf, collect_counts, checkpoint=str(tmp_path / "ckpt"), trigger_available_now=True
    )
    q.awaitTermination()
    assert sum(n for _, n in seen) == batch.count()


def test_parquet_sink_writes_exactly_once(spark, sf_dir, tmp_path):
    batch = sources.parquet_table(spark, sf_dir, "region")
    src_dir, out_dir, ckpt = (str(tmp_path / d) for d in ["src", "out", "ckpt"])
    batch.write.parquet(src_dir)
    sdf = sources.file_stream(spark, src_dir, batch.schema)
    q = sinks.parquet_sink(sdf, out_dir, ckpt, trigger_available_now=True)
    q.awaitTermination()
    # restart with the same checkpoint: no new input -> no duplicates
    q2 = sinks.parquet_sink(sdf, out_dir, ckpt, trigger_available_now=True)
    q2.awaitTermination()
    assert spark.read.parquet(out_dir).count() == batch.count()


def test_jsonl_corpus_source_routes_corrupt_records(spark, tmp_path):
    """JSONL ingest (round 5): good rows parse to the schema, broken
    lines land in the quarantine side — none lost, job never fails."""
    import json as _json

    from malstrom_spark.sources import jsonl_corpus_source

    p = tmp_path / "shard-000.jsonl"
    lines = [
        _json.dumps({"doc_id": 1, "text": "hello world", "lang": "en"}),
        '{"doc_id": 2, "text": "truncated...',          # broken JSON
        _json.dumps({"doc_id": 3, "text": "ok", "lang": "de"}),
        "not json at all",
        _json.dumps({"doc_id": 4, "text": None, "lang": "en"}),  # null field ok
    ]
    p.write_text("\n".join(lines) + "\n")
    good, bad = jsonl_corpus_source(
        spark, str(p), "doc_id long, text string, lang string"
    )
    g = {r.doc_id: (r.text, r.lang) for r in good.collect()}
    assert g == {1: ("hello world", "en"), 3: ("ok", "de"), 4: (None, "en")}
    b = sorted(r.corrupt_record for r in bad.collect())
    assert b == ["not json at all", '{"doc_id": 2, "text": "truncated...']


def test_jsonl_corpus_source_streaming(spark, tmp_path):
    """The streaming form: same routing through the file stream source
    (checkpointed shard arrival), run to completion via availableNow."""
    import json as _json

    from malstrom_spark.sources import jsonl_corpus_source
    from malstrom_spark.streaming.replay import run_to_memory

    d = tmp_path / "shards"
    d.mkdir()
    (d / "a.jsonl").write_text(
        _json.dumps({"doc_id": 1, "text": "x"}) + "\nBROKEN{\n"
    )
    (d / "b.jsonl").write_text(_json.dumps({"doc_id": 2, "text": "y"}) + "\n")
    good, bad = jsonl_corpus_source(
        spark, str(d), "doc_id long, text string", streaming=True
    )
    got_good = run_to_memory(good, output_mode="append")
    got_bad = run_to_memory(bad, output_mode="append")
    assert {r.doc_id for r in got_good.collect()} == {1, 2}
    assert [r.corrupt_record for r in got_bad.collect()] == ["BROKEN{"]
