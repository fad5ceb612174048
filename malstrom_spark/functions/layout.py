"""Z-order (Morton) data layout — multi-column clustering keys for
write-time file layout, so that LATER reads prune on any prefix of
the clustered dimensions via parquet min/max statistics. This is the
OPTIMIZE ZORDER primitive of the lakehouse world (public Delta/
Iceberg feature, re-derived from the Morton-curve definition), and
the piece that turns "100 TB scan" into "read the 3 files whose
(user, time) rectangles intersect the predicate": sorting by a
single column clusters only that column; interleaving bits clusters
ALL participating columns simultaneously, at a bounded loss per
dimension.

Everything here is pure integer Column arithmetic (quantize ->
interleave ~ one long expression of shifts/masks, whole-stage
codegen, zero Python, zero UDF), plus ONE RangePartitioning exchange
in `repartition_by_zorder` — exactly the shuffle a layout job exists
to perform. Quantization is integer math ((v - lo) * (2^bits - 1)
DIV (hi - lo), clamped), so a SQL oracle reproduces every key bit
for bit; `zorder_sql` renders the identical expression for DuckDB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check(specs: Sequence[tuple], bits: int) -> None:
    if not specs:
        raise ValueError("zorder needs at least one (col, lo, hi) spec")
    if bits < 1 or bits * len(specs) > 63:
        raise ValueError(
            f"bits * n_cols must fit a signed BIGINT: got {bits} * {len(specs)}"
        )
    top = (1 << bits) - 1
    for _, lo, hi in specs:
        if not hi > lo:
            raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
        if (hi - lo) > (1 << 62) // top:
            raise ValueError(
                f"(hi - lo) * (2^bits - 1) overflows BIGINT for "
                f"[{lo}, {hi}] at {bits} bits — pre-bucket the column "
                "(e.g. epoch-micros -> minutes) or lower bits"
            )


def quantize(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Map an integer column into [0, 2^bits): linear scale over
    [lo, hi], clamped outside. EXACT integer floor division — not
    floor(double-division), whose correctly-rounded quotient can land
    ON an integer the true quotient sits just below, flipping a
    bucket (and a Morton key) vs the oracle's `//`. Spark has no
    Column-level `div` operator, so the floor is taken with the mod
    identity: (p - p % d) is exactly divisible by d, and the division
    runs in DECIMAL (exact for integer-valued operands) before the
    long cast. _check guards the p = (v - lo) * top product range."""
    top = (1 << bits) - 1
    d = hi - lo
    v = F.greatest(F.least(col.cast("long"), F.lit(hi)), F.lit(lo))
    p = (v - F.lit(lo)) * F.lit(top)
    exact = (p - F.pmod(p, F.lit(d))).cast("decimal(38,0)")
    return (exact / F.lit(d).cast("decimal(19,0)")).cast("long")


def zorder_key(specs: Sequence[tuple[Column, int, int]], bits: int = 16) -> Column:
    """The Morton key: quantize each (col, lo, hi) to `bits` bits and
    interleave — bit i of column j lands at position i * n_cols + j.
    Returns a non-negative BIGINT Column."""
    _check(specs, bits)
    n = len(specs)
    qs = [quantize(c, lo, hi, bits) for c, lo, hi in specs]
    z = F.lit(0).cast("long")
    for j, q in enumerate(qs):
        for i in range(bits):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1).cast("long"))
            z = z + F.shiftleft(bit, i * n + j)
    return z


def zorder_sql(specs: Sequence[tuple[str, int, int]], bits: int = 16) -> str:
    """DuckDB rendering of the identical key (for oracles): pass SQL
    expressions instead of Columns."""
    n = len(specs)
    terms = []
    for j, (expr, lo, hi) in enumerate(specs):
        top = (1 << bits) - 1
        q = (f"(((GREATEST(LEAST(CAST({expr} AS BIGINT), {hi}), {lo})"
             f" - {lo}) * {top}) // {hi - lo})")
        for i in range(bits):
            terms.append(f"((({q} >> {i}) & 1) << {i * n + j})")
    return "(" + " + ".join(terms) + ")"


def repartition_by_zorder(
    df: DataFrame,
    specs: Sequence[tuple[Column, int, int]],
    n_partitions: int,
    bits: int = 16,
    key_col: str = "zkey",
    keep_key: bool = False,
) -> DataFrame:
    """The layout job: compute the Morton key, range-partition on it
    (contiguous curve segments -> tight per-file min/max rectangles on
    EVERY clustered column) and sort within partitions so row groups
    inherit the clustering too. Write the result with any sink; the
    key column is dropped unless keep_key."""
    keyed = df.withColumn(key_col, zorder_key(specs, bits))
    out = (
        keyed.repartitionByRange(n_partitions, F.col(key_col))
        .sortWithinPartitions(key_col)
    )
    return out if keep_key else out.drop(key_col)
