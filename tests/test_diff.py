"""Snapshot diff (operators/diff.py)."""

import pytest

from malstrom_spark.operators.diff import table_diff


def _sides(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),        # unchanged
         (2, "B", 21.0),        # both columns changed
         (3, "c", 30.0),        # NULL -> value is a change
         (5, "e", 50.0)],       # added; 4 removed
        "k long, s string, v double",
    )
    return old, new


def test_classification_and_changed_cols(spark):
    old, new = _sides(spark)
    got = {r["k"]: (r["status"], r["changed_cols"])
           for r in table_diff(old, new, "k").collect()}
    assert got == {
        2: ("changed", ["s", "v"]),
        3: ("changed", ["v"]),
        4: ("removed", []),
        5: ("added", []),
    }


def test_include_unchanged_and_subset_compare(spark):
    old, new = _sides(spark)
    all_rows = table_diff(old, new, "k", include_unchanged=True).collect()
    assert {r["k"]: r["status"] for r in all_rows}[1] == "unchanged"
    only_s = {r["k"]: r["status"]
              for r in table_diff(old, new, "k", compare=["s"]).collect()}
    assert only_s[2] == "changed"
    assert 3 not in only_s  # v is not compared, so key 3 is unchanged


def test_missing_compare_column_raises(spark):
    old, new = _sides(spark)
    with pytest.raises(ValueError, match="absent"):
        table_diff(old, new, "k", compare=["nope"])


def test_single_join_plan(spark):
    old, new = _sides(spark)
    plan = table_diff(old, new, "k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Join") == 1
    assert "Window" not in plan
