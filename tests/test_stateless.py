"""Golden tests for stateless ops — mirrors the reference's per-
operator unit tests (map.rs:77-99, filter.rs:81-100, flatten.rs:86-163,
split.rs:119-185, cloned.rs tests): SingleIteratorSource -> operator ->
VecSink -> assert exact expected vector."""

import pyspark.sql.functions as F
import pytest

from malstrom_spark.operators import stateless
from malstrom_spark.stream import Stream


@pytest.fixture(scope="module")
def nums(spark):
    # reference fixture: 0..100 with ts = index (FIXTURES.md 'numbers')
    return spark.createDataFrame([(i, i) for i in range(100)], "seq long, value long")


def test_map(nums):
    out = stateless.map_cols(nums, {"value": F.col("value") * 2})
    got = sorted(r.value for r in out.collect())
    assert got == [i * 2 for i in range(100)]


def test_map_preserves_other_columns(nums):
    out = stateless.map_cols(nums, {"doubled": F.col("value") * 2})
    row = out.filter(F.col("seq") == 3).collect()[0]
    assert (row.seq, row.value, row.doubled) == (3, 3, 6)


def test_filter(nums):
    out = stateless.filter_rows(nums, F.col("value") % 2 == 0)
    assert sorted(r.value for r in out.collect()) == [i for i in range(100) if i % 2 == 0]


def test_filter_map(nums):
    # reference filter_map: parse-like transform dropping Nones
    out = stateless.filter_map(
        nums,
        {"halved": F.when(F.col("value") % 2 == 0, F.col("value") / 2)},
        F.col("halved").isNotNull(),
    )
    assert sorted(r.halved for r in out.collect()) == [float(i) for i in range(50)]


def test_flatten_preserves_key_and_ts(spark):
    # reference flatten.rs:86-163: key and timestamp cloned onto every element
    df = spark.createDataFrame(
        [("k1", 7, ["a", "b"]), ("k2", 8, ["c"])],
        "key string, ts long, items array<string>",
    )
    out = stateless.flatten(df, "items", "item").collect()
    got = sorted((r.key, r.ts, r.item) for r in out)
    assert got == [("k1", 7, "a"), ("k1", 7, "b"), ("k2", 8, "c")]


def test_split_routes_and_can_overlap(nums):
    evens, odds, all_ = stateless.split(
        nums, F.col("value") % 2 == 0, F.col("value") % 2 == 1, F.lit(True)
    )
    assert evens.count() == 50 and odds.count() == 50 and all_.count() == 100


def test_cloned(nums):
    a, b = stateless.cloned(nums, 2)
    assert a.count() == b.count() == 100


def test_union_by_name(spark):
    d1 = spark.createDataFrame([(1, "x")], "a long, b string")
    d2 = spark.createDataFrame([("y", 2)], "b string, a long")
    out = stateless.union(d1, d2)
    assert sorted((r.a, r.b) for r in out.collect()) == [(1, "x"), (2, "y")]


def test_inspect_observe(nums):
    out = stateless.inspect(nums, "probe", F.count(F.lit(1)).alias("rows"))
    assert out.count() == 100  # pass-through


def test_stream_builder_chain(spark):
    s = Stream.from_df(spark.createDataFrame([(i,) for i in range(10)], "v long"))
    out = (
        s.filter(F.col("v") > 2)
        .map({"w": F.col("v") * 10})
        .key_by("w")
        .agg({"n": F.count(F.lit(1))})
    )
    assert out.df.count() == 7
