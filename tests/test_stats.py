"""Grouped OLS (functions/stats.py)."""

import duckdb

from pyspark.sql import functions as F

from malstrom_spark.functions.stats import grouped_ols, grouped_ols_sql


ROWS = [
    # key a: exact line y = 3x + 10
    ("a", 0, 10), ("a", 1, 13), ("a", 2, 16), ("a", 3, 19),
    # key b: noisy points
    ("b", 0, 5), ("b", 1, 9), ("b", 2, 6), ("b", 3, 14),
    # key c: single point -> undefined fit
    ("c", 7, 7),
    # key d: zero x-variance -> undefined fit
    ("d", 2, 1), ("d", 2, 9),
]


def test_exact_line_recovered(spark):
    df = spark.createDataFrame(ROWS, "k string, x long, y long")
    got = {r["k"]: (r["n"], r["slope"], r["intercept"])
           for r in grouped_ols(df, ["k"], F.col("x"), F.col("y")).collect()}
    assert got["a"] == (4, 3.0, 10.0)
    assert got["c"] == (1, None, None)
    assert got["d"] == (2, None, None)
    # closed-form check for b: n=4 sx=6 sy=34 sxy=63 sxx=14
    # slope = (4*63-6*34)/(4*14-36) = 48/20 = 2.4
    import math

    want_icpt = math.floor((34 / 4 - (48 / 20) * 6 / 4) * 1e6) / 1e6
    slope_q = math.floor(2.4 * 1e6) / 1e6  # floor-quantized, not rounded
    assert got["b"] == (4, slope_q, want_icpt)


def test_sql_twin_matches(spark):
    df = spark.createDataFrame(ROWS, "k string, x long, y long")
    got = {r["k"]: (r["n"], r["slope"], r["intercept"])
           for r in grouped_ols(df, ["k"], F.col("x"), F.col("y")).collect()}
    vals = ",".join(f"('{k}',{x},{y})" for k, x, y in ROWS)
    duck = duckdb.sql(grouped_ols_sql(
        "k", "x", "y", f"(SELECT * FROM (VALUES {vals}) t(k, x, y))"
    )).fetchall()
    assert {k: (n, s, i) for k, n, s, i in duck} == got


def test_single_combinable_aggregate_plan(spark):
    df = spark.createDataFrame(ROWS, "k string, x long, y long")
    plan = grouped_ols(df, ["k"], F.col("x"), F.col("y")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") == 1
    assert "partial_sum" in plan.split("Exchange")[-1]
