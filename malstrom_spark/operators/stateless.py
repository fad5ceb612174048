"""Stateless transformation operators (reference SURVEY §2.1/§2.4).

Each function is DataFrame-in / DataFrame-out and compiles to native
Catalyst expressions — no Python in the hot path. Parity targets:

- map          -> reference operators/map.rs:39-65
- filter       -> reference operators/filter.rs:45-70
- filter_map   -> reference operators/filter_map.rs:44-73
- flatten      -> reference operators/flatten.rs:46-73
- inspect      -> reference operators/inspect.rs:45-78
- split        -> reference operators/split.rs:17-106
- cloned       -> reference operators/cloned.rs:12-34
- union        -> reference stream/builder.rs:82-88

The reference invokes a user closure per record; here transforms are
declared as Column expressions so Catalyst can push them down, prune
columns, and keep them inside whole-stage codegen. A Python escape
hatch (`map_pandas`) exists for logic Columns can't express — it uses
Arrow-batched `mapInPandas`, never row-at-a-time UDFs.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def map_cols(df: DataFrame, exprs: Mapping[str, Column | str]) -> DataFrame:
    """1->1 value transform, key/timestamp untouched (map.rs:39-65).

    `exprs` maps output column name -> Column expression (or SQL string).
    Existing columns are replaced, new ones appended — matching the
    reference's ``map`` which rewrites the value while preserving
    key/timestamp.
    """
    out = df
    resolved = {k: (F.expr(v) if isinstance(v, str) else v) for k, v in exprs.items()}
    return out.withColumns(resolved)


def map_pandas(df: DataFrame, fn: Callable, schema) -> DataFrame:
    """Arbitrary-closure map: Arrow-batched, per-partition (stateless_op.rs:8-80).

    `fn(iter[pd.DataFrame]) -> iter[pd.DataFrame]`. This is the slow
    path — prefer `map_cols` whenever a Column expression suffices.
    """
    return df.mapInPandas(fn, schema=schema)


def filter_rows(df: DataFrame, predicate: Column | str) -> DataFrame:
    """Keep rows where predicate is true (filter.rs:45-70)."""
    return df.filter(predicate)


def filter_map(df: DataFrame, exprs: Mapping[str, Column | str], keep: Column | str) -> DataFrame:
    """map + drop-None fused (filter_map.rs:44-73).

    Applies `exprs` then keeps rows where `keep` is non-null/true.
    Catalyst fuses both into a single stage, so like the reference this
    is one pass.
    """
    out = map_cols(df, exprs)
    cond = F.expr(keep) if isinstance(keep, str) else keep
    return out.filter(cond)


def flatten(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """1->N explode of an array column; all sibling columns (key,
    timestamp, ...) are cloned onto every element (flatten.rs:46-73,
    key/ts-preservation invariants flatten.rs:86-163)."""
    out_col = out_col or col
    others = [c for c in df.columns if c != col]
    return df.select(*others, F.explode(F.col(col)).alias(out_col))


def inspect(df: DataFrame, name: str, *metrics: Column) -> DataFrame:
    """Side-effect observer, pass-through (inspect.rs:45-78).

    Implemented with `df.observe` — metrics are collected by the engine
    at execution time without forcing a second pass. Default metric is
    a row count, mirroring the reference's debug/metrics use."""
    if not metrics:
        metrics = (F.count(F.lit(1)).alias("rows"),)
    return df.observe(name, *metrics)


def split(df: DataFrame, *predicates: Column | str) -> tuple[DataFrame, ...]:
    """Route records to N output streams (split.rs:17-106).

    Returns one filtered view per predicate. Views may overlap
    (duplicate) or under-cover (drop) exactly like the reference's
    `Fn(&msg, &mut [bool])` router. Spark plans are lazily shared, so
    this costs nothing until each branch is executed; cache upstream if
    several branches run in one job.
    """
    outs = []
    for p in predicates:
        cond = F.expr(p) if isinstance(p, str) else p
        outs.append(df.filter(cond))
    return tuple(outs)


def cloned(df: DataFrame, n: int) -> tuple[DataFrame, ...]:
    """Broadcast the stream to N consumers (cloned.rs:12-34).

    DataFrames are reusable plans; each clone is the same lineage. For
    batch jobs that execute all clones, `df.persist()` upstream avoids
    recomputing the common prefix.
    """
    return tuple(df for _ in range(n))


def union(first: DataFrame, *rest: DataFrame) -> DataFrame:
    """N-way merge of same-typed streams (stream/builder.rs:82-88).

    Uses unionByName: the reference requires identical types; Spark
    additionally aligns by column name. Watermark semantics on unioned
    streaming inputs follow Spark's global-min policy, matching the
    reference's epoch min-merge (channels/operator_io.rs:256-268).
    """
    out = first
    for df in rest:
        out = out.unionByName(df)
    return out
