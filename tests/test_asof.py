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


def test_asof_pandas_tiebreak(spark):
    """Equal right_ts ties must break by the largest tiebreak on the
    pandas path too (regression: merge_asof used input order)."""
    left = spark.createDataFrame([("a", 10, 1)], "key string, lts long, lid long")
    # two right rows tie at rts=10; larger rid must win regardless of
    # input order
    right = spark.createDataFrame(
        [("a", 10, 202), ("a", 10, 201)], "key string, rts long, rid long"
    )
    out = as_of_join(
        left, right, "key", "lts", "rts", ["rid"], tiebreak="rid", strategy="pandas"
    )
    assert out.collect()[0].rid == 202


def test_asof_default_strategy_plans(sides):
    """Default strategy must be the co-grouped merge (no row-expanding
    left join) unless the right side is broadcast."""
    left, right = sides
    plan_default = as_of_join(
        left, right, "key", "lts", "rts", ["rid"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan_default
    plan_bcast = as_of_join(
        left, right, "key", "lts", "rts", ["rid"], tiebreak="rid", broadcast_right=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_bcast or "BroadcastNestedLoopJoin" in plan_bcast
    assert "FlatMapCoGroupsInPandas" not in plan_bcast
