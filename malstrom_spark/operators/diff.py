"""Table diff — compare two snapshots of a keyed table and classify
every key as added / removed / changed (with the exact set of
changed columns) or unchanged. The reconciliation primitive behind
data-migration sign-off ("did the rewrite produce the same table?"),
CDC validation (apply the changelog, diff against the vendor's
snapshot) and dataset versioning UIs. Composes with
operators/cdc.py: cdc_compact(log) then table_diff(old, new) is the
end-to-end "what did today's changes do" report.

Semantics:
- keys must be unique per side (this diffs SNAPSHOTS — run
  cdc_compact or check_unique first if unsure);
- comparison is NULL-SAFE per column (NULL -> value is a change,
  NULL -> NULL is not);
- changed_cols is the sorted array of differing column names —
  sorted so the output is deterministic and oracle-comparable.

100 TB shape: ONE full-outer shuffle join on the keys — the minimum
possible for a diff — with every per-column comparison a codegen
expression on the joined row. No second pass, no window; project
only the compared columns upstream and the shuffle carries exactly
what the diff needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: str | Sequence[str],
    compare: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Returns keys + status ('added'|'removed'|'changed'|
    'unchanged') + changed_cols (sorted array<string>, empty unless
    status='changed')."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if compare is None:
        compare = [c for c in old.columns if c not in keys]
    missing = [c for c in compare if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"table_diff: compare column(s) {missing} absent on a side")

    o = old.select(*keys, *[F.col(c).alias(f"__o_{c}") for c in compare],
                   F.lit(1).alias("__in_o"))
    n = new.select(*keys, *[F.col(c).alias(f"__n_{c}") for c in compare],
                   F.lit(1).alias("__in_n"))
    j = o.join(n, keys, "full_outer")

    changed = F.array_sort(
        F.filter(
            F.array(*[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                    F.lit(c),
                )
                for c in compare
            ]),
            lambda x: x.isNotNull(),
        )
    )
    status = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *keys,
        status.alias("status"),
        F.when(status == "changed", changed)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out
