"""Funnel / ordered-sequence matching (CEP-lite) — the "did this user
do A then B then C, in order, within N days of A" analysis that
stream engines ship as dedicated operators (Flink CEP patterns,
ClickHouse windowFunnel). The reference has no such operator (users
would hand-roll it over `stateful_map` state); here it is a
first-class batch operator with exact, deterministic semantics:

  For each user, t1 = the EARLIEST event matching step 1;
  t_k (k>1)   = the earliest event matching step k with
                ts > t_{k-1} and ts <= t1 + within.

Strictly increasing timestamps mean one event can never satisfy two
steps, and equal-timestamp events cannot chain — the same contract a
min()-chained SQL formulation produces, which is exactly how the
oracle verifies it (queries/relational.py event_funnel_*).

Physical shape (100 TB): events are pre-filtered map-side to rows
matching ANY step and projected to (user, ts, K flag booleans) before
the single shuffle on user; per-user matching is a codegen'd
higher-order `aggregate` fold over the time-sorted event array — no
Python, no window expansion, state per user = K timestamps. Per-user
array size is bounded by that user's step-relevant events; pathological
hot users are a data problem shared by every sessionization op (cap
with a per-user limit upstream if needed).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check_within(within: str | None) -> None:
    """Calendar units (month/quarter/year) have no fixed width, so
    the batch engine (calendar arithmetic) and the streaming twin
    (fixed-micros state kernel) would silently disagree — rejected in
    both to keep the documented exact-parity contract."""
    if within is None:
        return
    low = within.lower()
    if any(u in low for u in ("month", "quarter", "year")):
        raise ValueError(
            f"within={within!r}: calendar units are not supported "
            "(no fixed width; use days/hours/minutes)"
        )


def funnel_times(
    df: DataFrame,
    user: str | Sequence[str],
    ts: str,
    steps: Sequence[tuple[str, Column]],
    within: str | None = None,
    max_events_per_user: int | None = None,
) -> DataFrame:
    """Per-user earliest completion time of each funnel prefix.

    user: the grouping key — one column name, or a sequence of names
    for composite keys (e.g. tenant + user); chains are computed per
    distinct key tuple. steps: ordered (name, predicate Column) pairs;
    within: INTERVAL literal (e.g. '7 days') bounding the whole chain
    relative to t1, or None for unbounded. Output: the key column(s),
    t_<name> timestamp per step (null = that prefix never completed).

    ``max_events_per_user=N`` bounds the per-user state: BEFORE the
    fold, keep only the earliest N events per (user, step) — a rank
    prune sharing the fold's single Exchange+Sort on user, so the
    collected array is <= K*N rows however hot the user (a 10M-event
    bot user otherwise makes one task hold a 10M-element array).
    CONTRACT: exact whenever every (user, step) has <= N matching
    events (nothing is pruned); beyond that, pruning can only delay or
    null a chain time — it drops LATER events per step, and the chain
    reads the earliest matches first — never invent an earlier one.
    Pick N >= the step multiplicity a real (non-bot) user can produce.
    """
    users = [user] if isinstance(user, str) else list(user)
    if not users:
        raise ValueError("user key columns must be non-empty")
    ukeys = [f"__u{i}" for i in range(len(users))]
    names = [n for n, _ in steps]
    if not names:
        raise ValueError("steps must be non-empty")
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate step names: {names}")
    _check_within(within)
    flags = [p.cast("boolean").alias(f"__f{i}") for i, (_, p) in enumerate(steps)]
    any_step = None
    for _, p in steps:
        any_step = p if any_step is None else (any_step | p)

    # null event times can't order in a chain; both twins drop them
    ev = df.filter(any_step & F.col(ts).isNotNull()).select(
        *[F.col(c).alias(k) for c, k in zip(users, ukeys)],
        F.col(ts).alias("__ts"),
        *flags,
    )
    if max_events_per_user is not None:
        if max_events_per_user < 1:
            raise ValueError("max_events_per_user must be >= 1")
        from pyspark.sql import Window

        # earliest-N-per-(user, step) prune: one running count per step
        # over a single window spec — same partitioning as the fold's
        # groupBy, so Catalyst plans ONE Exchange for prune + fold
        # (flag columns break timestamp ties deterministically)
        w = (
            Window.partitionBy(*ukeys)
            .orderBy("__ts", *[f"__f{i}" for i in range(len(steps))])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        keep = None
        for i in range(len(steps)):
            fi = F.coalesce(F.col(f"__f{i}"), F.lit(False))
            rank_i = F.sum(fi.cast("int")).over(w)
            k_i = fi & (rank_i <= max_events_per_user)
            keep = k_i if keep is None else (keep | k_i)
        ev = ev.withColumn("__keep", keep).filter("__keep").drop("__keep")
    arr = ev.groupBy(*ukeys).agg(
        F.array_sort(
            F.collect_list(F.struct("__ts", *[f"__f{i}" for i in range(len(steps))]))
        ).alias("__evs")
    )

    k = len(steps)
    init = F.struct(
        *[F.lit(None).cast(df.schema[ts].dataType).alias(f"t{i}") for i in range(k)]
    )

    def update(acc: Column, e: Column) -> Column:
        fields = []
        for i in range(k):
            cond = F.coalesce(e[f"__f{i}"], F.lit(False))
            if i > 0:
                cond = cond & acc[f"t{i-1}"].isNotNull() & (e["__ts"] > acc[f"t{i-1}"])
                if within is not None:
                    cond = cond & (e["__ts"] <= acc["t0"] + F.expr(f"INTERVAL {within}"))
            # all new fields read the OLD acc, so one event can never
            # fill two steps (parallel update = strict chaining)
            fields.append(
                F.coalesce(acc[f"t{i}"], F.when(cond, e["__ts"])).alias(f"t{i}")
            )
        return F.struct(*fields)

    folded = arr.select(*ukeys, F.aggregate("__evs", init, update).alias("__t"))
    return folded.select(
        *[F.col(uk).alias(c) for uk, c in zip(ukeys, users)],
        *[F.col(f"__t.t{i}").alias(f"t_{names[i]}") for i in range(k)],
    )


def funnel_counts(
    df: DataFrame,
    user: str | Sequence[str],
    ts: str,
    steps: Sequence[tuple[str, Column]],
    within: str | None = None,
    max_events_per_user: int | None = None,
) -> DataFrame:
    """Funnel conversion table: for each step (in order), how many
    users completed the prefix ending at that step. Output columns:
    step_idx (1-based), step, n_users — n_users is non-increasing by
    construction."""
    times = funnel_times(df, user, ts, steps, within, max_events_per_user)
    return counts_table(times, [n for n, _ in steps])


def latest_chain_times(times: DataFrame, user: str, names: Sequence[str]) -> DataFrame:
    """Consolidate a MULTI-EMISSION chain-times frame (the streaming
    funnel emits one row per user per microbatch / per watermark fold)
    to the latest chain per user — required before `counts_table`
    whenever the replay may produce more than one microbatch, or the
    per-batch rows overcount every step.

    Exact without any ordering column because chain times only fill
    FORWARD (a set t_k is never revised): the latest row per user is
    recovered as max(t_k) per step — max ignores nulls, and a non-null
    t_k is identical in every row that carries it."""
    return times.groupBy(F.col(user)).agg(
        *[F.max(F.col(f"t_{n}")).alias(f"t_{n}") for n in names]
    )


def counts_table(times: DataFrame, names: Sequence[str]) -> DataFrame:
    """(step_idx, step, n_users) conversion table from a per-user
    chain-times frame with t_<name> columns — shared by the batch and
    streaming funnels so both emit the same contract."""
    counts = times.agg(
        *[F.count(F.col(f"t_{n}")).cast("long").alias(f"c{i}") for i, n in enumerate(names)]
    )
    # one tiny row -> explode into (step, count) rows without another scan
    pairs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_idx"),
                F.lit(n).alias("step"),
                F.col(f"c{i}").alias("n_users"),
            )
            for i, n in enumerate(names)
        ]
    )
    return counts.select(F.explode(pairs).alias("p")).select("p.*")
