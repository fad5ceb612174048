"""Data-quality expectations (functions/expect.py)."""

import pytest

from pyspark.sql import functions as F

from malstrom_spark.functions import expect


def _df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "O"), (3, None, "X"), (4, 7.0, None)],
        "k long, price double, status string",
    )


def test_check_rows_counts_and_null_is_violation(spark):
    rep = {r["rule"]: (r["n_rows"], r["n_violations"], r["ok"])
           for r in expect.check_rows(_df(spark), {
               "price_positive": F.col("price") > 0,
               "status_known": F.col("status").isin("O", "F"),
           }).collect()}
    # price: -5 fails, NULL price fails (NULL predicate = violation)
    assert rep["price_positive"] == (4, 2, False)
    # status: 'X' fails, NULL status fails
    assert rep["status_known"] == (4, 2, False)


def test_check_rows_single_aggregation_plan(spark):
    out = expect.check_rows(_df(spark), {
        "a": F.col("price") > 0, "b": F.col("k") > 0, "c": F.col("k") < 9,
    })
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one scan, one aggregate — rule count never multiplies passes
    assert plan.count("Scan") == 1


def test_check_unique(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "a"), (2, "a"), (None, "x"), (None, "y")],
        "k long, v string",
    )
    rep = expect.check_unique(df, ["k"]).collect()[0]
    # k=1 has 2 extra rows, NULL key has 1 extra (NULL==NULL here)
    assert (rep["rule"], rep["n_rows"], rep["n_violations"], rep["ok"]) == \
        ("unique:k", 6, 3, False)
    ok = expect.check_unique(df.select("k", "v").distinct(), ["k", "v"])
    assert ok.collect()[0]["ok"]


def test_check_foreign_key(spark):
    dim = spark.createDataFrame([(1,), (3,)], "id long")
    fact = spark.createDataFrame([(1,), (2,), (None,)], "k long")
    rep = expect.check_foreign_key(fact, "k", dim, "id").collect()[0]
    # k=2 is an orphan; NULL key is NOT an fk violation
    assert (rep["n_rows"], rep["n_violations"], rep["ok"]) == (3, 1, False)
    assert rep["rule"] == "fk:k->id"


def test_quarantine_split_and_tags(spark):
    good, bad = expect.quarantine(_df(spark), {
        "price_positive": F.col("price") > 0,
        "status_known": F.col("status").isin("O", "F"),
    })
    assert [r["k"] for r in good.collect()] == [1]
    assert "failed_rules" not in good.columns
    tags = {r["k"]: r["failed_rules"] for r in bad.collect()}
    assert tags == {
        2: ["price_positive"],
        3: ["price_positive", "status_known"],
        4: ["status_known"],
    }


def test_empty_rules_raise(spark):
    with pytest.raises(ValueError):
        expect.check_rows(_df(spark), {})
    with pytest.raises(ValueError):
        expect.quarantine(_df(spark), {})
