"""Z-order layout (functions/layout.py)."""

import pytest

from pyspark.sql import functions as F

from malstrom_spark.functions import layout


def _grid(spark, n=8):
    return spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long")


def test_morton_hand_values(spark):
    out = _grid(spark).withColumn(
        "z", layout.zorder_key([(F.col("x"), 0, 7), (F.col("y"), 0, 7)], 3))
    z = {(r["x"], r["y"]): r["z"] for r in out.collect()}
    assert (z[(0, 0)], z[(1, 0)], z[(0, 1)], z[(1, 1)]) == (0, 1, 2, 3)
    assert z[(7, 7)] == 63
    assert sorted(z.values()) == list(range(64))  # bijective on the grid


def test_quantize_clamps_and_scales(spark):
    df = spark.createDataFrame([(-5,), (0,), (50,), (100,), (200,)], "v long")
    got = [r["q"] for r in df.select(
        layout.quantize(F.col("v"), 0, 100, 4).alias("q")).collect()]
    assert got == [0, 0, 7, 15, 15]  # floor(50*15/100)=7; clamped ends


def test_sql_twin_matches_spark(spark):
    import duckdb
    out = _grid(spark).withColumn(
        "z", layout.zorder_key([(F.col("x"), 0, 7), (F.col("y"), 0, 7)], 3))
    spark_z = {(r["x"], r["y"]): r["z"] for r in out.collect()}
    sql = layout.zorder_sql([("x", 0, 7), ("y", 0, 7)], 3)
    duck = duckdb.sql(
        f"SELECT x, y, {sql} AS z FROM (SELECT unnest(range(8)) AS x), "
        f"(SELECT unnest(range(8)) AS y)").fetchall()
    assert {(x, y): z for x, y, z in duck} == spark_z


def test_validation(spark):
    with pytest.raises(ValueError, match="at least one"):
        layout.zorder_key([], 8)
    with pytest.raises(ValueError, match="BIGINT"):
        layout.zorder_key([(F.col("x"), 0, 1)] * 4, 16)  # 64 bits
    with pytest.raises(ValueError, match="hi > lo"):
        layout.zorder_key([(F.col("x"), 5, 5)], 8)


def test_repartition_gives_disjoint_curve_segments(spark):
    """The layout contract: after repartition_by_zorder each partition
    holds a CONTIGUOUS segment of the Morton curve — z-ranges of
    different partitions never overlap, which is what makes per-file
    min/max rectangles tight on every clustered column."""
    df = _grid(spark, 16)
    out = layout.repartition_by_zorder(
        df, [(F.col("x"), 0, 15), (F.col("y"), 0, 15)], 4, bits=4,
        keep_key=True)
    spans = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in spans)
    assert len(spans) > 1
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2  # strictly disjoint segments
    # and the key is dropped by default
    assert "zkey" not in layout.repartition_by_zorder(
        df, [(F.col("x"), 0, 15), (F.col("y"), 0, 15)], 4, bits=4).columns


def test_plan_is_range_partitioning_no_global_sort(spark):
    df = _grid(spark)
    out = layout.repartition_by_zorder(
        df, [(F.col("x"), 0, 7), (F.col("y"), 0, 7)], 4, bits=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # local sort only (sortWithinPartitions), never a global Sort node
    assert plan.count("Exchange") == 1
