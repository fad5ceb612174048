"""Data-quality expectations — declarative row rules compiled into
ONE aggregation pass, plus uniqueness / referential checks and a
row-level quarantine splitter. This is the validation stage every
production pipeline runs between ingest and the expensive operators
(the public "expectations" pattern of Great Expectations / Delta
Live Tables, re-expressed as plain Column algebra); the reference
has no analog (its inspect operator observes, SURVEY §2.1 — this
ENFORCES).

Design:
- `check_rows` turns {rule_name: boolean Column} into a single
  `agg(count, sum(violations per rule))` — one scan, zero shuffles
  beyond the one-row aggregate, however many rules. NULL predicate
  results count as VIOLATIONS (a rule that cannot evaluate is not
  satisfied) — made explicit with coalesce so the report can't
  silently under-count nulls.
- `check_unique` counts rows beyond the first per key (one count
  aggregate with map-side combine — not a distinct-then-subtract
  double scan).
- `check_foreign_key` counts fact rows whose key misses the
  dimension: LEFT ANTI join, dimension broadcast-eligible.
- `quarantine` splits rows by ALL rules at once, tagging each bad
  row with the array of failed rule names (explode-free: one
  filter + one array expression per side; rides the same scan).

Everything is integer counts — the registry row is hash-exact by
construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violated(pred: Column) -> Column:
    # NULL predicate = violation: not satisfied is not satisfied
    return F.when(F.coalesce(pred, F.lit(False)), F.lit(0)).otherwise(F.lit(1))


def check_rows(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (rule, n_rows, n_violations, ok). Single
    aggregation pass over the input regardless of rule count."""
    if not rules:
        raise ValueError("check_rows needs at least one rule")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")] + [
        F.sum(_violated(pred)).cast("long").alias(f"__v_{i}")
        for i, (_, pred) in enumerate(rules.items())
    ]
    wide = df.agg(*aggs)
    # explode an array of structs, NOT a selectExpr stack(): rule
    # names are caller data and must never be spliced into SQL text
    # (a quote in a name would break — or reshape — the parse)
    pairs = F.explode(
        F.array(*[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__v_{i}").alias("n_violations"),
            )
            for i, name in enumerate(rules)
        ])
    )
    return wide.select(F.col("__n"), pairs.alias("__p")).select(
        F.col("__p.rule").alias("rule"),
        F.col("__n").alias("n_rows"),
        F.col("__p.n_violations").alias("n_violations"),
        (F.col("__p.n_violations") == 0).alias("ok"),
    )


def check_unique(df: DataFrame, cols: list[str], rule: str | None = None) -> DataFrame:
    """(rule, n_rows, n_violations, ok) where a violation is every row
    BEYOND the first per key (so n_violations == 0 iff the key is
    unique). NULL keys participate like values (NULL == NULL for
    uniqueness, matching SQL DISTINCT semantics, not join =)."""
    name = rule or ("unique:" + ",".join(cols))
    per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
    rep = per_key.agg(
        F.sum("__c").cast("long").alias("n_rows"),
        F.sum(F.col("__c") - 1).cast("long").alias("n_violations"),
    )
    return rep.select(
        F.lit(name).alias("rule"), "n_rows", "n_violations",
        (F.col("n_violations") == 0).alias("ok"),
    )


def check_foreign_key(
    fact: DataFrame, key: str, dim: DataFrame, dim_key: str,
    rule: str | None = None,
) -> DataFrame:
    """(rule, n_rows, n_violations, ok): fact rows whose non-null key
    has no match in the dimension. NULL fact keys are NOT violations
    of the reference (add an is-not-null row rule for that)."""
    name = rule or f"fk:{key}->{dim_key}"
    n_rows = fact.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    orphans = (
        fact.where(F.col(key).isNotNull())
        .join(dim.select(F.col(dim_key).alias(key)).distinct(), key, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    )
    return n_rows.crossJoin(orphans).select(
        F.lit(name).alias("rule"), "n_rows", "n_violations",
        (F.col("n_violations") == 0).alias("ok"),
    )


def quarantine(
    df: DataFrame, rules: dict[str, Column], failed_col: str = "failed_rules"
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): good rows pass every rule; bad rows carry the
    sorted array of failed rule names in `failed_col`. Both sides are
    plain filters over the same scan — no shuffle, no second pass."""
    if not rules:
        raise ValueError("quarantine needs at least one rule")
    fails = F.array_sort(
        F.filter(
            F.array(*[
                F.when(_violated(pred) == 1, F.lit(name))
                for name, pred in rules.items()
            ]),
            lambda x: x.isNotNull(),
        )
    )
    tagged = df.withColumn(failed_col, fails)
    good = tagged.where(F.size(failed_col) == 0).drop(failed_col)
    bad = tagged.where(F.size(failed_col) > 0)
    return good, bad
