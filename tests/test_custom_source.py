"""Custom partitioned streaming source (sources/custom.py): the
reference's StatefulSource contract — partition listing, per-partition
offset state, resume-after-restart — proven the same way the
reference proves it (sources/stateful.rs:418-467): run, stop, add
data, restart from the checkpoint, and assert the source resumed
exactly after the persisted offsets (no replay, no loss)."""

import pathlib

from malstrom_spark.sources.custom import register_line_file_source


def _drain(spark, src_dir: pathlib.Path, ckpt: pathlib.Path, out: pathlib.Path):
    sdf = (
        spark.readStream.format("malstrom_line_files")
        .option("path", str(src_dir))
        .load()
    )
    # parquet sink: checkpoint-recoverable (memory sink is not), and
    # the file-sink commit log gives exactly-once output on restart
    q = (
        sdf.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema("file string, line_no long, line string").parquet(str(out))


def test_line_file_source_resumes_from_offsets(spark, tmp_path):
    register_line_file_source(spark)
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    out = tmp_path / "out"
    (src / "a.txt").write_text("a0\na1\n")
    (src / "b.txt").write_text("b0\n")

    first = {(r.file, r.line_no, r.line) for r in _drain(spark, src, ckpt, out).collect()}
    assert first == {("a.txt", 0, "a0"), ("a.txt", 1, "a1"), ("b.txt", 0, "b0")}

    # grow an existing partition AND add a new one, then restart from
    # the same checkpoint
    (src / "a.txt").write_text("a0\na1\na2\n")
    (src / "c.txt").write_text("c0\n")

    second = {(r.file, r.line_no, r.line) for r in _drain(spark, src, ckpt, out).collect()}
    # resumed AFTER the committed offsets: exactly the new line and the
    # new file appended — nothing replayed, nothing lost
    assert second == first | {("a.txt", 2, "a2"), ("c.txt", 0, "c0")}
