"""Mergeable binned-histogram quantiles (operators/histogram.py,
round 5): integer-exact linear binning, log binning vs a Python
reference, rank targets in rational arithmetic, quantile-within-bin
guarantee against exact percentiles, and decomposability — the same
histogram partials roll up through hypertable_rollup (bin as a key)
and yield identical quantiles at the coarser grain."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from malstrom_spark.operators.histogram import (
    histogram,
    linear_bin,
    log_bin,
    quantile_bins,
)

LO, HI, NB = 0, 60_000, 600  # cents: [0, 600.00) in 1.00 bins — covers sf0.1's max 560.21
QS = [0.5, 0.9, 0.95, 0.99]


def _cents(col):
    return F.round(col * 100).cast("long")


def test_linear_bin_matches_python_reference(spark):
    rng = random.Random(11)
    vals = [round(rng.uniform(-10, 600), 2) for _ in range(2000)] + [
        0.0, 499.99, 500.0, -0.01, 123.45,
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    got = {
        r.i: r.b
        for r in df.select("i", linear_bin(_cents(F.col("v")), LO, HI, NB).alias("b")).collect()
    }
    for i, v in enumerate(vals):
        c = round(v * 100)
        want = -1 if c < LO else NB if c >= HI else (c - LO) // ((HI - LO) // NB)
        assert got[i] == want, (v, got[i], want)


def test_log_bin_matches_python_reference(spark):
    rng = random.Random(7)
    vals = [rng.uniform(0.05, 5000) for _ in range(2000)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    got = {
        r.i: r.b
        for r in df.select("i", log_bin(F.col("v"), 0.1, 1.1, 120).alias("b")).collect()
    }
    for i, v in enumerate(vals):
        if v < 0.1:
            want = -1
        else:
            want = math.floor(math.log(v / 0.1) / math.log(1.1))
            want = 120 if want >= 120 else want
        assert got[i] == want, (v, got[i], want)


def test_quantiles_contain_exact_rank_statistic(spark, sf_dir):
    """The guarantee, stated exactly: the qbin CONTAINS the k-th
    smallest value with k = ceil(q * n) — the discrete quantile the
    rational rank target defines. (Interpolated `percentile()` can sit
    below it on sparse groups; the discrete statistic is the
    engine-portable definition the histogram answers.)"""
    import math

    from malstrom_spark.queries import table

    ev = table(spark, sf_dir, "events")
    hist = histogram(ev, ["event_type"], linear_bin(_cents(F.col("value")), LO, HI, NB))
    qb = {
        (r.event_type, r.q): r.qbin
        for r in quantile_bins(hist, ["event_type"], QS).collect()
    }
    width = (HI - LO) // NB
    vals: dict[str, list] = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(round(r.value * 100))
    checked = 0
    for et, cs in vals.items():
        cs.sort()
        for q in QS:
            k = math.ceil(q * len(cs))
            kth = cs[k - 1]
            b = qb[(et, q)]
            assert LO + b * width <= kth < LO + (b + 1) * width, (et, q, b, kth)
            checked += 1
    assert checked == len(vals) * len(QS)


def test_histogram_rolls_up_through_hypertable(spark, sf_dir):
    """Decomposability: hour-grain histogram partials roll to day via
    hypertable_rollup (bin among the keys) and the day-grain quantiles
    equal quantiles computed from a direct day-grain histogram."""
    from malstrom_spark.operators.windows import hypertable_rollup
    from malstrom_spark.queries import table

    ev = table(spark, sf_dir, "events")
    binned = ev.withColumn("bin", linear_bin(_cents(F.col("value")), LO, HI, NB))
    rolled = hypertable_rollup(
        binned, "ts", keys=["event_type", "bin"],
        aggs={"n": ("count", F.lit(1))}, grains=("hour", "day"),
    )
    day_hist = rolled.filter(F.col("grain") == "day").select(
        F.col("bucket"), "event_type", "bin", "n"
    )
    via_rollup = {
        (r.bucket, r.event_type, r.q): r.qbin
        for r in quantile_bins(day_hist, ["bucket", "event_type"], QS).collect()
    }
    direct_hist = histogram(
        ev.withColumn("bucket", F.date_trunc("day", "ts")),
        ["bucket", "event_type"],
        linear_bin(_cents(F.col("value")), LO, HI, NB),
    )
    direct = {
        (r.bucket, r.event_type, r.q): r.qbin
        for r in quantile_bins(direct_hist, ["bucket", "event_type"], QS).collect()
    }
    assert len(via_rollup) > 50
    assert via_rollup == direct


def test_linear_bin_rejects_uneven_width():
    import pytest

    with pytest.raises(ValueError, match="multiple"):
        linear_bin(F.lit(1), 0, 100, 33)


def test_weighted_histogram_quantiles(spark):
    """Weighted quantiles (bytes-weighted latency shape): qbin must
    contain the smallest value v where cumulative weight of values
    <= v reaches ceil(q * total_weight)."""
    import math
    import random

    rng = random.Random(23)
    rows = [(i, rng.randint(0, 9999), rng.randint(1, 500)) for i in range(3000)]
    df = spark.createDataFrame(rows, "i long, v long, w long")
    hist = histogram(df, [], linear_bin(F.col("v"), 0, 10_000, 100), weight=F.col("w"))
    qb = {r.q: r.qbin for r in quantile_bins(hist, [], [0.5, 0.99]).collect()}

    total = sum(w for _, _, w in rows)
    ordered = sorted((v, w) for _, v, w in rows)
    for q in (0.5, 0.99):
        target, cum = math.ceil(q * total), 0
        for v, w in ordered:
            cum += w
            if cum >= target:
                kth = v
                break
        b = qb[q]
        assert b * 100 <= kth < (b + 1) * 100, (q, b, kth)


def test_linear_bin_exact_beyond_double_precision(spark):
    """Round-5 review: values beyond 2^53 (nanosecond-scaled ranges)
    must bin by EXACT integer arithmetic — double division would land
    boundary values one bin off."""
    lo, hi = 1_700_000_000_000_000_000, 1_700_000_000_000_000_000 + 7_000_000_000
    nb = 7_000  # width = 1_000_000
    width = (hi - lo) // nb
    import random

    rng = random.Random(31)
    vals = [lo + rng.randrange(0, hi - lo) for _ in range(500)]
    # exact boundaries and off-by-one-ulp neighborhoods
    for k in (0, 1, 3499, 6999):
        edge = lo + k * width
        vals += [edge - 1, edge, edge + 1]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v long")
    got = {
        r.i: r.b
        for r in df.select("i", linear_bin(F.col("v"), lo, hi, nb).alias("b")).collect()
    }
    for i, v in enumerate(vals):
        want = -1 if v < lo else nb if v >= hi else (v - lo) // width
        assert got[i] == want, (v, got[i], want)


def test_flag_outliers_iqr_hand_checked(spark):
    from malstrom_spark.operators.histogram import flag_outliers_iqr, linear_bin

    # key 'a': bins 10..19 uniform (q25=12, q75=17, iqr=5, k=3/2 -> 7)
    # fences [5, 24]; value in bin 30 and bin 1 are outliers
    rows = [("a", b * 10) for b in range(10, 20) for _ in range(4)]
    rows += [("a", 300), ("a", 10)]
    df = spark.createDataFrame(rows, "k string, v long")
    out = flag_outliers_iqr(df, ["k"], linear_bin(F.col("v"), 0, 1000, 100))
    flagged = sorted(r["bin"] for r in out.collect() if r["is_outlier"])
    assert flagged == [1, 30]
    n_ok = sum(1 for r in out.collect() if not r["is_outlier"])
    assert n_ok == 40


def test_flag_outliers_iqr_integer_fence(spark):
    """k = 1/3 with iqr not divisible by 3: the fence floor must be
    the exact integer floor (iqr=5 -> k-shift = floor(5/3) = 1)."""
    from malstrom_spark.operators.histogram import flag_outliers_iqr, linear_bin

    rows = [("a", b * 10) for b in (10, 12, 14, 15, 17)]
    df = spark.createDataFrame(rows, "k string, v long")
    out = flag_outliers_iqr(
        df, ["k"], linear_bin(F.col("v"), 0, 1000, 100), k_num=1, k_den=3)
    got = {r["bin"]: r["is_outlier"] for r in out.collect()}
    # q25 bin = 12, q75 bin = 15 (ceil ranks over 5 rows), iqr 3,
    # shift floor(3/3) = 1 -> fences [11, 16]
    assert got == {10: True, 12: False, 14: False, 15: False, 17: True}
