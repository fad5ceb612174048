"""Mergeable quantiles via binned histograms — the decomposable
percentile story for very large data. Exact percentiles do not
decompose (partials cannot merge) and Spark's `percentile_approx`
exposes no mergeable partial either; a binned histogram does: the
partial is (bin -> count), merge is elementwise sum, and any quantile
reads off the merged counts with error bounded by one bin width. The
reference has no aggregation library at all (SURVEY §2.8); this is
the continuous-aggregate companion to `hypertable_rollup` — with the
bin as an extra key, histogram partials flow through the SAME rollup
machinery (hour -> day -> week by plain count-sum) and through
`persist_stage` across jobs.

Design choices for engine-exactness (driver oracle = DuckDB):
- `linear_bin` does its arithmetic on SCALED INTEGERS (e.g. cents),
  so bin assignment is integer division — bit-identical in any
  engine, no float-boundary flakiness;
- `log_bin` covers wide-dynamic-range values (latencies, sizes);
  float log arithmetic is deterministic per engine but not proven
  identical across engines at bin boundaries, so it is pinned by
  pytest against a Python reference instead of the SQL oracle;
- quantile targets use RATIONAL arithmetic (ceil(q * total) computed
  as (num * total + den - 1) div den), never float rounding.
"""

from __future__ import annotations

from collections.abc import Sequence
from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def linear_bin(
    scaled_col: Column, lo: int, hi: int, n_bins: int
) -> Column:
    """Bin index over [lo, hi) in INTEGER units (pre-scale floats —
    e.g. cents = CAST(value*100 AS BIGINT) — so assignment is exact
    integer division). Bins 0..n_bins-1 are equal-width; -1 catches
    v < lo and n_bins catches v >= hi, so no value is silently
    dropped. hi - lo must divide evenly by n_bins."""
    if (hi - lo) % n_bins != 0:
        raise ValueError(
            f"hi - lo = {hi - lo} must be a multiple of n_bins = {n_bins} "
            "(integer-exact bin width)"
        )
    width = (hi - lo) // n_bins
    v = scaled_col.cast("long")
    d = v - F.lit(lo)
    # Column `/` is double division, which rounds above 2^53 (e.g.
    # nanosecond-scaled ranges) and could land a value one bin off vs
    # an engine doing exact integer division. The float quotient is
    # at most n_bins, so its absolute error is far below 1 — floor it,
    # then correct the possible off-by-one with EXACT int64 compares.
    q = F.floor(d / F.lit(float(width))).cast("long")
    q = F.when(d < q * F.lit(width), q - 1).otherwise(q)
    q = F.when(d >= (q + 1) * F.lit(width), q + 1).otherwise(q)
    return (
        F.when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(n_bins))
        .otherwise(q)
        .cast("int")
    )


def log_bin(col: Column, lo: float, ratio: float, n_bins: int) -> Column:
    """Geometric bins: bin i covers [lo * ratio^i, lo * ratio^(i+1)).
    Relative quantile error <= ratio - 1 (e.g. ratio=1.05 -> 5%) over
    any dynamic range with only log(hi/lo)/log(ratio) bins — the
    latency-histogram shape. -1/n_bins catch under/overflow."""
    import math

    if lo <= 0 or ratio <= 1:
        raise ValueError("log_bin needs lo > 0 and ratio > 1")
    idx = F.floor(F.log(col / F.lit(float(lo))) / F.lit(math.log(ratio)))
    return (
        F.when(col < lo, F.lit(-1))
        .when(idx >= n_bins, F.lit(n_bins))
        .otherwise(idx)
        .cast("int")
    )


def histogram(
    df: DataFrame,
    keys: Sequence[str],
    bin_expr: Column,
    bin_col: str = "bin",
    weight: Column | None = None,
) -> DataFrame:
    """Long-format histogram partials: (keys..., bin, n). One shuffle;
    map-side combined. Rolls up along ANY dimension by summing n —
    time grains via hypertable_rollup with `bin` among the keys,
    cross-job via persist_stage.

    ``weight`` switches to a WEIGHTED histogram (n = sum of weights,
    e.g. bytes per request for a bytes-weighted latency percentile);
    keep the weight integer (or cast DECIMAL and round) so the rank
    arithmetic in `quantile_bins` stays engine-exact.

    NULL values (null bin) are EXCLUDED: a null carries no rank
    information, and counting it into the total would shift every
    quantile — and do so differently per engine (NULLS FIRST vs LAST
    window ordering)."""
    n = F.count(F.lit(1)) if weight is None else F.sum(weight)
    binned = df.withColumn(bin_col, bin_expr).where(F.col(bin_col).isNotNull())
    return binned.groupBy(*keys, bin_col).agg(n.cast("long").alias("n"))


def quantile_bins(
    hist: DataFrame,
    keys: Sequence[str],
    qs: Sequence[float],
    bin_col: str = "bin",
    n_col: str = "n",
) -> DataFrame:
    """Per key group, the smallest bin whose cumulative count reaches
    each quantile target: output (keys..., q double, qbin int). The
    true q-quantile lies inside qbin, so any in-bin convention (upper
    edge, midpoint) bounds the error by one bin width.

    Targets are rationals: ceil(q * total) computed in integer
    arithmetic from Fraction(str(q)), so engine float rounding can
    never shift a rank. One window over the partials (they are tiny:
    n_bins rows per group), no second shuffle of raw data."""
    from pyspark.sql import Window

    keys = list(keys)
    fracs = [Fraction(str(q)) for q in qs]
    # defensive twin of histogram()'s null exclusion, for hand-built
    # partials: a null bin must not count toward totals or cum order
    hist = hist.where(F.col(bin_col).isNotNull())
    w_all = Window.partitionBy(*keys)
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(F.col(bin_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    h = hist.withColumn("__total", F.sum(n_col).over(w_all)).withColumn(
        "__cum", F.sum(n_col).over(w_cum)
    )
    aggs = []
    for i, fr in enumerate(fracs):
        target = F.expr(
            f"({fr.numerator}L * __total + {fr.denominator - 1}L) div {fr.denominator}L"
        )
        aggs.append(
            F.min(F.when(F.col("__cum") >= target, F.col(bin_col))).alias(f"__q{i}")
        )
    wide = h.groupBy(*keys).agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(q)).alias("q"), F.col(f"__q{i}").alias("qbin")
            )
            for i, q in enumerate(qs)
        ]
    )
    return wide.select(*keys, F.explode(pairs).alias("__p")).select(
        *keys, F.col("__p.q").alias("q"), F.col("__p.qbin").alias("qbin")
    )


def flag_outliers_iqr(
    df: DataFrame,
    keys: Sequence[str],
    bin_expr: Column,
    k_num: int = 3,
    k_den: int = 2,
    bin_col: str = "bin",
) -> DataFrame:
    """Robust per-group outlier flagging — the Tukey-fence rule
    (outside [q25 - k*IQR, q75 + k*IQR], default k = 3/2) computed
    entirely in BIN space from the mergeable histogram: quantile bins
    come from `quantile_bins` (rank targets in integer arithmetic),
    the fence is integer arithmetic on bin indices (k as the rational
    k_num/k_den, floored — so the fence itself is engine-exact), and
    rows are flagged by comparing their own bin against the fence.
    The one approximation is bin granularity, the same one-bin bound
    the quantile rollup documents — median/MAD-style robustness
    without a per-group sort of the raw data.

    Output: input columns + bin + is_outlier. 100 TB shape: one
    histogram aggregation (map-side combined), a window over the tiny
    per-group partials, and ONE broadcast-eligible join of the
    per-group fence back onto the rows — the raw data shuffles zero
    times beyond the histogram's key partitioning (and even that is
    combinable)."""
    keys = list(keys)
    binned = df.withColumn(bin_col, bin_expr).where(F.col(bin_col).isNotNull())
    hist = binned.groupBy(*keys, bin_col).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    qb = quantile_bins(hist, keys, [0.25, 0.75], bin_col=bin_col)
    fences = (
        qb.groupBy(*keys)
        .pivot("q", [0.25, 0.75])
        .agg(F.first("qbin"))
        .select(
            *keys,
            F.col("`0.25`").alias("__q25"),
            F.col("`0.75`").alias("__q75"),
        )
        .withColumn("__iqr", F.col("__q75") - F.col("__q25"))
        # exact integer floor division via the mod identity (floor of
        # a double quotient can disagree with // at the boundary —
        # the layout.quantize lesson); (p - p % d) is exactly
        # divisible, so the double division is exact
        .withColumn("__p", F.col("__iqr").cast("long") * k_num)
        .withColumn(
            "__k",
            ((F.col("__p") - F.pmod("__p", F.lit(k_den))) / F.lit(k_den))
            .cast("int"),
        )
        .select(
            *keys,
            (F.col("__q25") - F.col("__k")).alias("__lo"),
            (F.col("__q75") + F.col("__k")).alias("__hi"),
        )
    )
    return binned.join(fences, keys).select(
        *df.columns,
        F.col(bin_col),
        ((F.col(bin_col) < F.col("__lo"))
         | (F.col(bin_col) > F.col("__hi"))).alias("is_outlier"),
    )
