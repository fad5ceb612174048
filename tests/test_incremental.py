"""Incremental aggregate maintenance (operators/incremental.py)."""

import pytest

from pyspark.sql import functions as F

from malstrom_spark.operators import incremental as inc


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def test_merge_equals_full_scan(spark):
    a = _df(spark, [("x", 1), ("x", 5), ("y", 2), ("z", None)])
    b = _df(spark, [("x", 3), ("y", None), ("w", 9)])
    merged = inc.merge_states(
        ["k"], ["v"],
        inc.aggregate_state(a, ["k"], ["v"]),
        inc.aggregate_state(b, ["k"], ["v"]),
    )
    full = inc.aggregate_state(a.unionByName(b), ["k"], ["v"])
    key = lambda df: {r["k"]: (r["n_rows"], r["v_n"], r["v_sum"],
                               r["v_min"], r["v_max"]) for r in df.collect()}
    got, want = key(merged), key(full)
    assert got == want
    assert got["x"] == (3, 3, 9, 1, 5)
    assert got["z"] == (1, 0, None, None, None)  # all-null value column


def test_merge_is_associative_over_many_states(spark):
    parts = [_df(spark, [("k", i)]) for i in range(5)]
    states = [inc.aggregate_state(p, ["k"], ["v"]) for p in parts]
    merged = inc.merge_states(["k"], ["v"], *states)
    r = merged.collect()[0]
    assert (r["n_rows"], r["v_sum"], r["v_min"], r["v_max"]) == (5, 10, 0, 4)


def test_finalize_avg_null_safe(spark):
    st = inc.aggregate_state(
        _df(spark, [("a", 4), ("a", 6), ("b", None)]), ["k"], ["v"])
    fin = {r["k"]: r["v_avg"] for r in
           inc.finalize_state(st, ["v"]).collect()}
    assert fin["a"] == 5.0
    assert fin["b"] is None


def test_validation(spark):
    df = _df(spark, [("a", 1)])
    with pytest.raises(ValueError):
        inc.aggregate_state(df, ["k"], [])
    with pytest.raises(ValueError):
        inc.merge_states(["k"], ["v"])


def test_merge_shuffle_is_state_sized(spark):
    """The merge groupBy runs over one-row-per-key unions — its input
    exchanges carry state rows, never the raw data columns."""
    a = inc.aggregate_state(_df(spark, [("a", 1)]), ["k"], ["v"])
    b = inc.aggregate_state(_df(spark, [("a", 2)]), ["k"], ["v"])
    plan = inc.merge_states(["k"], ["v"], a, b)._jdf.queryExecution() \
        .executedPlan().toString()
    # partial aggregation below every exchange (combinable merge)
    assert "partial_sum" in plan.split("Exchange")[-1] or \
           "partial_count" in plan.split("Exchange")[-1]
