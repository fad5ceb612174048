"""As-of join: both physical strategies must agree with a hand-
computed golden result (backward, per-key, tie -> larger tiebreak)."""

import pytest

from malstrom_spark.operators.asof import as_of_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("b", 15, 3), ("c", 5, 4)],
        "key string, lts long, lid long",
    )
    right = spark.createDataFrame(
        [("a", 5, 100), ("a", 10, 101), ("a", 18, 102), ("b", 15, 103), ("b", 16, 104)],
        "key string, rts long, rid long",
    )
    return left, right


GOLDEN = {1: 101, 2: 102, 3: 103, 4: None}


def test_asof_join_strategy(sides):
    left, right = sides
    out = as_of_join(
        left, right, "key", "lts", "rts", ["rid"], tiebreak="rid", strategy="join"
    )
    got = {r.lid: r.rid for r in out.collect()}
    assert got == GOLDEN


def test_asof_pandas_strategy(sides):
    left, right = sides
    out = as_of_join(left, right, "key", "lts", "rts", ["rid"], strategy="pandas")
    got = {r.lid: r.rid for r in out.collect()}
    assert got == GOLDEN
