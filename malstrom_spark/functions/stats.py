"""Grouped statistical model fitting — closed-form per-key simple
linear regression (OLS) from EXACT integer/decimal moment sums, the
trend-per-entity pass of a metrics pipeline (per-customer spend
trend, per-source quality drift). Extends the exact-moment family of
relational2.py's lineitem_stats_by_flag (mean/var/corr) with the
fitted-line coefficients.

Exactness discipline (same as BM25/PageRank/quantiles): all five
moments (n, Σx, Σy, Σxy, Σx²) accumulate as BIGINT/DECIMAL — order-
free, engine-identical; the ONLY floating steps are the final two
divisions (slope, intercept), each a single correctly-rounded op on
exact operands. The result is quantized with FLOOR(x * 1e6) / 1e6,
NOT round(x, 6): ROUND on a double is not engine-portable once the
value's ulp approaches the rounding grid (measured: intercepts at
1.7e7 flipped the last digit between Spark's BigDecimal HALF_UP and
DuckDB's float rounding), while floor of a bit-identical double is
deterministic everywhere.
Callers pass INTEGER x and y (epoch days, cents) — that is what
makes the moments exact; pre-quantize doubles first.

100 TB shape: one combinable groupBy — five sums per key, partial
aggregation map-side, no window, no second pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_ols(
    df: DataFrame,
    keys: Sequence[str],
    x: Column,
    y: Column,
    round_to: int = 6,
) -> DataFrame:
    """Per-key OLS fit of y = slope * x + intercept. x and y must be
    integer-valued Columns (cast/quantize first). Output: keys + n
    (BIGINT) + slope + intercept (DOUBLE, NULL when the fit is
    undefined — fewer than 2 points or zero x-variance)."""
    keys = list(keys)
    q = float(10 ** round_to)
    quant = lambda c: F.floor(c * F.lit(q)) / F.lit(q)  # noqa: E731
    xl, yl = x.cast("long"), y.cast("long")
    sums = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xl).alias("sx"),
        F.sum(yl).alias("sy"),
        F.sum(xl * yl).alias("sxy"),
        F.sum(xl * xl).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(den != 0, quant(num.cast("double") / den.cast("double")))
    # intercept from the same exact sums: (Σy - slope*Σx) / n, with
    # slope re-derived inline so the one rounding applies at the end
    icpt = F.when(
        den != 0,
        quant(
            (F.col("sy").cast("double")
             - (num.cast("double") / den.cast("double"))
             * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ),
    )
    return sums.select(
        *keys, "n", slope.alias("slope"), icpt.alias("intercept")
    )


def grouped_ols_sql(
    keys_sql: str, x_sql: str, y_sql: str, from_sql: str, round_to: int = 6
) -> str:
    """DuckDB twin rendering the IDENTICAL arithmetic (exact BIGINT
    moments, same division order, same floor-quantization) for
    oracles."""
    q = float(10 ** round_to)
    return f"""
    WITH s AS (
      SELECT {keys_sql} AS k,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST({x_sql} AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST({y_sql} AS BIGINT)) AS BIGINT) AS sy,
             CAST(SUM(CAST({x_sql} AS BIGINT) * CAST({y_sql} AS BIGINT)) AS BIGINT) AS sxy,
             CAST(SUM(CAST({x_sql} AS BIGINT) * CAST({x_sql} AS BIGINT)) AS BIGINT) AS sxx
      FROM {from_sql}
      GROUP BY {keys_sql}
    )
    SELECT k, n,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) * {q}) / {q}
           END AS slope,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             FLOOR((CAST(sy AS DOUBLE)
                    - (CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE))
                      * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) * {q}) / {q}
           END AS intercept
    FROM s
    """
