"""Multimodal plumbing: binary columns through mapInPandas with the
documented stub kernels — schema contract and batch shape are real."""

from malstrom_spark.functions import multimodal


def test_image_meta_schema_and_rows(spark):
    df = spark.createDataFrame([(1, "abcdef"), (2, "xy")], "id long, raw string")
    payloads = multimodal.attach_binary_column(df, "raw").drop("raw")
    out = multimodal.extract_image_meta(payloads)
    rows = {r.id: r for r in out.collect()}
    assert set(out.columns) == {"id", "width", "height", "mode", "n_bytes"}
    assert rows[1].n_bytes == 6 and rows[2].n_bytes == 2
    assert rows[1].mode == "RGB"


def test_frame_sample_explodes(spark):
    df = spark.createDataFrame([(1, "0123456789" * 5)], "id long, raw string")
    payloads = multimodal.attach_binary_column(df, "raw").drop("raw")
    out = multimodal.frame_sample(payloads, every_n=10).collect()
    assert len(out) > 1  # 1 -> N explode shape
    assert all(r.id == 1 for r in out)
    assert out[0].frame_idx == 0


def test_audio_features(spark):
    df = spark.createDataFrame([(1, "aaaa")], "id long, raw string")
    payloads = multimodal.attach_binary_column(df, "raw").drop("raw")
    row = multimodal.audio_features(payloads).collect()[0]
    assert row.duration_ms == 32  # 4 bytes * 8
    assert row.rms == (4 * 37 + 13) % 256  # pure in byte length
