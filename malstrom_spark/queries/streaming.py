"""Streaming queries in the correctness gate: each runs a bounded
Structured Streaming replay to completion (availableNow) and returns
the materialized result, so the DuckDB oracle can check the SAME
semantics a batch query would have — the reference's bounded-stream
testing pattern (SingleIteratorSource -> VecSink, SURVEY §5 layer 1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..streaming.replay import replay_table, run_to_memory
from ..streaming.stateful import running_totals_stream
from . import register


@register(
    "streaming_hourly_counts",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_hourly_counts(spark, sf_dir):
    """Windowed streaming aggregation (SURVEY §2.5 Windows): tumbling
    1h event counts computed BY THE STREAMING ENGINE (microbatch,
    state store), then compared against the batch oracle."""
    ev = replay_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    result = run_to_memory(agg, output_mode="complete")
    return result.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
    )


@register(
    "streaming_user_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def streaming_user_totals(spark, sf_dir):
    """Keyed stateful streaming op (applyInPandasWithState — reference
    stateful_map semantics, stateful_map.rs:60-110): per-user running
    totals; with a single availableNow batch the final emission equals
    the batch aggregate, which the oracle checks. State accumulates
    integer cents (exact at any key cardinality × magnitude), matching
    the oracle's DECIMAL sum bit-for-bit — see
    `running_totals_stream(exact_cents=True)`."""
    ev = replay_table(spark, sf_dir, "events").select("user_id", "value")
    out = running_totals_stream(ev)
    result = run_to_memory(out, output_mode="append")
    return result.select(
        "user_id",
        "n_events",
        F.col("total_value").cast("decimal(28,2)").cast("double").alias("total_value"),
    )


@register(
    "streaming_session_windows",
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def streaming_session_windows(spark, sf_dir):
    """Session windows computed BY THE STREAMING ENGINE
    (F.session_window state merging — richer than the reference, whose
    windows are hand-built on stateful_op, SURVEY §2.5). 5-minute
    inactivity gap; Spark's gap is end-exclusive, mirrored by the
    oracle's `>= INTERVAL` new-session rule. Second precision in the
    output start avoids ns-vs-us edge formatting."""
    ev = replay_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.session_window("ts", "5 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    result = run_to_memory(agg, output_mode="complete")
    return result.select(
        "user_id",
        F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        "n_events",
    )


@register(
    "streaming_click_purchase_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS secs_to_purchase
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    """,
)
def streaming_click_purchase_join(spark, sf_dir):
    """STREAM-STREAM inner join (impossible in the reference — no
    binary join operator exists, SURVEY §2.8): click->purchase
    attribution within 10 minutes. Both sides carry watermarks so the
    engine can bound join state (clicks older than watermark - 10min
    are evicted); inner-join output is deterministic regardless of
    microbatching, so the batch oracle applies."""
    ev = replay_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    result = run_to_memory(joined, output_mode="append")
    return result.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("secs_to_purchase"),
    )


@register(
    "streaming_epoch_close",
    oracle="""
    WITH m AS (SELECT max(ts) AS mx FROM events)
    SELECT user_id,
           ((epoch_ms(ts) // 604800000) + 1) * 604800000 AS epoch_close_ms,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
    FROM events, m
    GROUP BY 1, 2, mx
    HAVING epoch_close_ms <= CAST(epoch_ms(mx) AS BIGINT)
    """,
)
def streaming_epoch_close(spark, sf_dir):
    """User-closure epoch windows (streaming/eventtime.py
    epoch_close_stream): the reference's `generate_epochs` closure +
    end-of-month example (generate_epochs.rs:39-127,
    examples/event_time.rs:94-152) — each record's epoch boundary
    comes from a user function; per-(user, epoch) totals emit ONLY
    when the watermark passes that user-defined boundary, and the
    last (never-closed) epoch stays unemitted, which the oracle
    mirrors with its HAVING clause. Timers re-arm for the earliest
    epoch still open. The probe closure uses 7-day epochs (the sf0.01
    events table spans a single month, so a calendar-month closure
    would close zero epochs); the calendar-month closure itself is
    pinned by tests/test_stateful_op_timers.py."""
    import pandas as pd

    from ..streaming.eventtime import epoch_close_stream

    WEEK_MS = 604_800_000

    def week_end_ms(ts: pd.Timestamp) -> int:
        return (int(ts.timestamp() * 1000) // WEEK_MS + 1) * WEEK_MS

    ev = replay_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    sdf = ev.withWatermark("ts", "0 seconds")
    out = epoch_close_stream(sdf, ["user_id"], "ts", week_end_ms, "value")
    result = run_to_memory(out, output_mode="append")
    return result.select(
        "user_id",
        "epoch_close_ms",
        "n_events",
        F.col("total_value").cast("decimal(28,2)").cast("double").alias("total_value"),
    )


@register(
    "streaming_daily_close",
    oracle="""
    WITH m AS (SELECT max(ts) AS mx FROM events)
    SELECT user_id,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
    FROM events, m
    GROUP BY user_id, date_trunc('day', ts), mx
    HAVING date_trunc('day', ts) + INTERVAL 1 DAY <= mx
    """,
)
def streaming_daily_close(spark, sf_dir):
    """Timer-driven day closing (streaming/stateful_op.py): per-user
    daily totals accumulate in keyed state and EMIT only when the
    watermark passes each day's end — fire-on-time-passing custom
    stateful logic. A day whose end the watermark never reached (the
    last day of the replay) stays open and is NOT emitted, which the
    oracle mirrors with its HAVING day_end <= max(ts) clause. State
    holds all open days per key; on each firing, every closed day is
    emitted and evicted and the timer re-arms for the earliest day
    still open (multi-timer semantics on a one-timer-per-key engine
    API)."""
    import pandas as pd

    from ..streaming.stateful_op import stateful_op_stream

    DAY_MS = 86_400_000

    def on_data(key, pdfs, state, _timers):
        days, ns, totals = (
            (list(state[0]), list(state[1]), list(state[2])) if state else ([], [], [])
        )
        for pdf in pdfs:
            d = pdf["ts"].dt.strftime("%Y-%m-%d")
            for day, grp in pdf.groupby(d):
                if day in days:
                    i = days.index(day)
                    ns[i] += len(grp)
                    totals[i] += float(grp["value"].sum())
                else:
                    days.append(day)
                    ns.append(len(grp))
                    totals.append(float(grp["value"].sum()))
        next_fire = min(
            int(pd.Timestamp(day).timestamp() * 1000) + DAY_MS for day in days
        )
        return [], (days, ns, totals), [next_fire]

    def day_end_ms(day: str) -> int:
        return int(pd.Timestamp(day).timestamp() * 1000) + DAY_MS

    def on_timer(key, fired_at_ms, state):
        if state is None:
            return [], None, []
        days, ns, totals = list(state[0]), list(state[1]), list(state[2])
        # close every day whose end the watermark has passed
        closed = [i for i, day in enumerate(days) if day_end_ms(day) <= fired_at_ms]
        if not closed:
            # spurious firing: re-arm for the earliest day still open
            return [], state, [min(day_end_ms(d) for d in days)]
        out = pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "day": [days[i] for i in closed],
                "n_events": [ns[i] for i in closed],
                "total_value": [totals[i] for i in closed],
            }
        )
        keep = [i for i in range(len(days)) if i not in closed]
        if not keep:
            return [out], None, []
        # re-arm for the earliest day still open so later windows fire
        # even if this key never sees data again (true multi-timer
        # semantics over the one-timer-per-key engine API)
        kept_state = ([days[i] for i in keep], [ns[i] for i in keep], [totals[i] for i in keep])
        return [out], kept_state, [min(day_end_ms(days[i]) for i in keep)]

    ev = replay_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    sdf = ev.withWatermark("ts", "0 seconds")
    out = stateful_op_stream(
        sdf,
        ["user_id"],
        on_data,
        on_timer,
        output_schema="user_id long, day string, n_events long, total_value double",
        state_schema="days array<string>, ns array<long>, totals array<double>",
    )
    result = run_to_memory(out, output_mode="append")
    return result.select(
        "user_id",
        "day",
        "n_events",
        F.col("total_value").cast("decimal(28,2)").cast("double").alias("total_value"),
    )


@register(
    "streaming_click_purchase_left_join",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, ts AS c_ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
    m AS (SELECT least((SELECT max(c_ts) FROM c), (SELECT max(p_ts) FROM p)) AS mx),
    j AS (
      SELECT c.user_id, c.click_id, c.c_ts, p.purchase_id
      FROM c LEFT JOIN p
        ON c.user_id = p.user_id
       AND p.p_ts > c.c_ts AND p.p_ts <= c.c_ts + INTERVAL 10 MINUTE
    )
    SELECT user_id, click_id,
           COALESCE(purchase_id, -1) AS purchase_id
    FROM j, m
    WHERE purchase_id IS NOT NULL
       OR c_ts + INTERVAL 10 MINUTE < mx
    """,
)
def streaming_click_purchase_left_join(spark, sf_dir):
    """Stream-stream LEFT OUTER join — the hardest streaming join
    semantics: matches emit immediately, but an UNMATCHED click may
    only emit (with nulls) once the watermark passes its join window,
    proving the click can no longer match. Clicks whose window was
    still open when the replay ended are withheld — and the watermark
    is the MIN of each side's own progress (so the last click can
    never close), mirrored by the oracle's
    `c_ts + 10min < least(max(c_ts), max(p_ts))` cutoff. Null
    purchase_id becomes -1 so both engines hash identically."""
    ev = replay_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "0 seconds")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "0 seconds")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
        "leftOuter",
    )
    result = run_to_memory(joined, output_mode="append")
    return result.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        F.coalesce("purchase_id", F.lit(-1)).alias("purchase_id"),
    )


@register(
    "streaming_dedup_exact",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n_events
    FROM (
      SELECT DISTINCT user_id, event_type, ts FROM events
    )
    GROUP BY user_id, event_type
    """,
)
def streaming_dedup_exact(spark, sf_dir):
    """STREAMING exact deduplication — the ingestion-side twin of the
    batch dedup pass every training pipeline runs: duplicate records
    (same user_id, event_type, ts) arriving across microbatches are
    dropped by engine-managed key state (`dropDuplicates` on a
    streaming DataFrame; at 100 TB use dropDuplicatesWithinWatermark
    so state is bounded by the lateness horizon instead of growing
    forever). The replay unions the events table with itself so every
    record genuinely arrives at least twice; counts then match the
    batch DISTINCT oracle. Registered outside the 50-row gate
    (full_registry tooling + pytest)."""
    ev = replay_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    doubled = ev.unionAll(ev)
    deduped = doubled.dropDuplicates(["user_id", "event_type", "ts"])
    agg = deduped.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n_events"))
    return run_to_memory(agg, output_mode="complete")


@register(
    "streaming_simhash_dedup",
    oracle="""
    -- the replay is SEEDED with a +100000-id copy of every 7th doc
    -- (the sf0.01 corpus has no natural byte-identical twins, which
    -- would make this check vacuous); every seeded copy shares its
    -- original's exact SimHash => all 4 chunks => always flagged.
    -- Near-dup verdicts depend on arrival-order state and are pinned
    -- by pytest instead.
    SELECT doc_id + 100000 AS doc_id, TRUE AS is_dup
    FROM documents
    WHERE text IS NOT NULL AND doc_id % 7 = 0
    ORDER BY 1
    """,
)
def streaming_simhash_dedup(spark, sf_dir):
    """STREAMING near-dup detection (streaming/dedup.py
    simhash_dup_flags_stream): SimHash chunks shard the stream, each
    shard keeps first-seen hashes as keyed state across microbatches,
    arrivals within the Hamming bound flag with the earlier doc's id.

    The registry row reduces to the EXACT-duplicate subset a SQL
    oracle can state: a byte-identical smaller twin shares all 4
    chunks, so the later copy always flags — against the twin, or
    transitively against whatever the twin itself matched (sound
    below the bucket cap, which this corpus never approaches). The
    near-dup verdicts and cross-batch recovery are pytest-pinned
    (tests/test_streaming_dedup.py). Registered outside the 50-row
    gate."""
    from ..streaming.dedup import collapse_dup_flags, simhash_dup_flags_stream
    from . import table

    docs = replay_table(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("text").isNotNull()
    )
    copies = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    flags = simhash_dup_flags_stream(docs.unionByName(copies), "doc_id")
    collapsed = collapse_dup_flags(run_to_memory(flags, output_mode="append"), "doc_id")
    seeded = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & (F.col("doc_id") % 7 == 0))
        .select((F.col("doc_id") + 100000).alias("doc_id"))
    )
    return (
        collapsed.where("is_dup")
        .join(seeded, "doc_id", "left_semi")
        .select("doc_id", F.lit(True).alias("is_dup"))
        .orderBy("doc_id")
    )


@register(
    "streaming_static_enrich",
    oracle="""
    SELECT c.c_mktsegment, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment, e.event_type
    """,
)
def streaming_static_enrich(spark, sf_dir):
    """STREAM-STATIC enrichment join — the operator class the
    reference would hand-build as broadcast state (a keyed dimension
    resident on every worker, looked up per record): a streaming fact
    joins a STATIC dimension table, which Spark broadcasts per
    microbatch; aggregation then runs keyed on dimension attributes.
    DECIMAL-summed totals keep the double engine-portable.
    Registered outside the 50-row gate."""
    ev = replay_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(F.col("c_custkey"), F.col("c_mktsegment"))
    )
    joined = ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
    agg = joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("total_value"),
    )
    return run_to_memory(agg, output_mode="complete")


@register(
    "streaming_funnel_s_c_p",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e
      JOIN s2 ON s2.user_id = e.user_id
      JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s1.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id)
    SELECT 1 AS step_idx, 'signup' AS step,
           (SELECT COUNT(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
    """,
)
def streaming_funnel_s_c_p(spark, sf_dir):
    """STREAMING funnel (streaming/funnel.py): the per-user chain
    state lives in the state store and is advanced by a vectorized
    min()-chaining kernel per microbatch; with the bounded availableNow
    replay the final chain equals the batch operator, so the SAME
    min()-chained SQL oracle as event_funnel_s_c_p verifies the
    stateful-streaming path end-to-end. Registered outside the 50-row
    gate (checked by tools/oracle_check.py + pytest parity)."""
    from ..streaming.funnel import funnel_stream

    ev = replay_table(spark, sf_dir, "events")
    out = funnel_stream(
        ev,
        "user_id",
        "ts",
        [
            ("signup", F.col("event_type") == "signup"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
        within="7 days",
    )
    final = run_to_memory(out, output_mode="append")
    from ..operators.funnel import counts_table, latest_chain_times

    # the append-mode sink holds one row per user per microbatch;
    # consolidate to the latest chain (exact under fill-forward) so the
    # counts stay correct under ANY replay batching, not just one batch
    names = ["signup", "click", "purchase"]
    return counts_table(latest_chain_times(final, "u", names), names)


@register(
    "streaming_user_state_scd2",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    changes AS (
      SELECT user_id, ts, event_id, event_type
      FROM ordered WHERE prev IS DISTINCT FROM event_type),
    final AS (
      SELECT user_id, event_type, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM changes)
    SELECT user_id, event_type,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(valid_to, '%Y-%m-%d %H:%M:%S'), 'current') AS valid_to,
           CAST(valid_to IS NULL AS BIGINT) AS is_current
    FROM final
    """,
)
def streaming_user_state_scd2(spark, sf_dir):
    """STREAMING SCD2 (streaming/scd.py): per-user event-type
    intervals built incrementally in the state store — closed
    intervals emitted as later events arrive, the open interval
    carried as keyed state; with the bounded availableNow replay the
    emitted set equals the batch operator, so the SAME two-window SQL
    oracle verifies the stateful path. Registered outside the 50-row
    gate (tools/oracle_check.py + pytest parity)."""
    from ..streaming.scd import consolidate_scd2, scd2_stream

    ev = replay_table(spark, sf_dir, "events")
    emitted = run_to_memory(
        scd2_stream(ev, key="user_id", ts="ts", attrs=["event_type"],
                    tiebreak="event_id"),
        output_mode="append",
    )
    # supersede-not-delete contract: collapse to the latest version per
    # interval so a multi-microbatch replay can't keep superseded opens
    out = consolidate_scd2(emitted, "user_id", ["event_type"])
    return out.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"), F.lit("current")
        ).alias("valid_to"),
        F.col("is_current").cast("long").alias("is_current"),
    )


_FLUSH_EVENT = [(-1, None, -1, "signup", 0.0, None)]  # ts filled at build


def _flush_rows():
    import datetime as dt

    e = list(_FLUSH_EVENT[0])
    e[1] = dt.datetime(2030, 1, 1)
    return [tuple(e)]


@register(
    "streaming_funnel_disorder",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e
      JOIN s2 ON s2.user_id = e.user_id
      JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s1.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id)
    SELECT 1 AS step_idx, 'signup' AS step,
           (SELECT COUNT(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
    """,
)
def streaming_funnel_disorder(spark, sf_dir):
    """STREAMING funnel in the WATERMARK-FINALIZED disorder mode
    (streaming/disorder.py, round 5) over a REAL multi-microbatch
    replay: 8 time-ranged files + a far-future flush event, one file
    per trigger, so per-user chains assemble across batches through
    the buffered state + event-time timers — and must still equal the
    same min()-chained SQL oracle as the batch row. The flush/sentinel
    user (-1) is excluded from the counts."""
    from ..operators.funnel import counts_table, latest_chain_times
    from ..streaming.funnel import funnel_stream
    from ..streaming.replay import replay_table_multibatch

    ev = replay_table_multibatch(
        spark, sf_dir, "events", n_files=8, flush_rows=_flush_rows()
    )
    out = funnel_stream(
        ev,
        "user_id",
        "ts",
        [
            ("signup", F.col("event_type") == "signup"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
        within="7 days",
        disorder_horizon="1 minute",
    )
    emitted = run_to_memory(out, output_mode="append").filter(F.col("u") >= 0)
    names = ["signup", "click", "purchase"]
    return counts_table(latest_chain_times(emitted, "u", names), names)


@register(
    "streaming_scd2_disorder",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    changes AS (
      SELECT user_id, ts, event_id, event_type
      FROM ordered WHERE prev IS DISTINCT FROM event_type),
    final AS (
      SELECT user_id, event_type, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM changes)
    SELECT user_id, event_type,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(valid_to, '%Y-%m-%d %H:%M:%S'), 'current') AS valid_to,
           CAST(valid_to IS NULL AS BIGINT) AS is_current
    FROM final
    """,
)
def streaming_scd2_disorder(spark, sf_dir):
    """STREAMING SCD2 in the disorder mode over the same 8-batch
    replay: intervals open and close across microbatches as the
    watermark finalizes events in event-time order; consolidated
    history must equal the batch operator's two-window SQL oracle
    exactly. Flush user (-1) excluded."""
    from ..streaming.replay import replay_table_multibatch
    from ..streaming.scd import consolidate_scd2, scd2_stream

    ev = replay_table_multibatch(
        spark, sf_dir, "events", n_files=8, flush_rows=_flush_rows()
    )
    emitted = run_to_memory(
        scd2_stream(ev, key="user_id", ts="ts", attrs=["event_type"],
                    tiebreak="event_id", disorder_horizon="1 minute"),
        output_mode="append",
    ).filter(F.col("user_id") >= 0)
    out = consolidate_scd2(emitted, "user_id", ["event_type"])
    return out.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"), F.lit("current")
        ).alias("valid_to"),
        F.col("is_current").cast("long").alias("is_current"),
    )


@register(
    "streaming_ordered_balance",
    oracle="""
    WITH r AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             SUM(CAST(round(value * 100) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS bal
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(MAX(bal) AS BIGINT) AS max_balance_cents,
           CAST(SUM(cents) AS BIGINT) AS final_balance_cents
    FROM r GROUP BY user_id
    """,
)
def streaming_ordered_balance(spark, sf_dir):
    """The GENERIC event-time-ordered stateful map
    (`stateful_map_ordered_stream`, streaming/disorder.py) on the
    reference's own motivating example — a per-account running balance
    folded in EVENT-TIME order under out-of-order arrival
    (examples/event_time.rs:107-152 builds its monthly balance exactly
    this way). Replayed as 8 time-ranged microbatches + flush; the
    closure keeps (balance, running-max, count) as integer-cents state
    and sees each user's events watermark-finalized in (ts, event_id)
    order, so the emitted running-MAX — which is order-SENSITIVE,
    unlike the final sum — must equal the batch prefix-sum window
    oracle exactly. Each fold emits a snapshot; the monotone event
    count picks the final one per user (max_by), keeping the append
    sink replay-batching-proof like the other disorder rows."""
    from ..streaming.disorder import stateful_map_ordered_stream
    from ..streaming.replay import replay_table_multibatch

    ev = replay_table_multibatch(
        spark, sf_dir, "events", n_files=8, flush_rows=_flush_rows()
    ).select("user_id", "ts", "event_id", "value")

    def fold(key, pdf, state):
        import pandas as pd

        bal, mx, n = state if state is not None else (0, None, 0)
        for v in pdf["value"]:
            bal += int(round(v * 100))
            mx = bal if mx is None or bal > mx else mx
            n += 1
        out = pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n],
             "max_balance_cents": [mx], "final_balance_cents": [bal]}
        )
        return [out], (bal, mx, n)

    emitted = run_to_memory(
        stateful_map_ordered_stream(
            ev,
            ["user_id"],
            "ts",
            fold,
            "user_id bigint, n_events bigint, max_balance_cents bigint, "
            "final_balance_cents bigint",
            state_schema="bal bigint, mx bigint, n bigint",
            disorder_horizon="1 minute",
            tiebreak="event_id",
        ),
        output_mode="append",
    ).filter(F.col("user_id") >= 0)
    return emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("max_balance_cents", "n_events").alias("max_balance_cents"),
        F.max_by("final_balance_cents", "n_events").alias("final_balance_cents"),
    )


@register(
    "streaming_value_quantiles",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CASE WHEN c < 0 THEN -1
                  WHEN c >= 60000 THEN 600
                  ELSE c // 100 END AS bin
      FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
            FROM events)
    ), h AS (
      SELECT event_type, bin, COUNT(*) AS n FROM b GROUP BY 1, 2
    ), c AS (
      SELECT event_type, bin,
             SUM(n) OVER (PARTITION BY event_type) AS total,
             SUM(n) OVER (PARTITION BY event_type
                          ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
      FROM h
    ), q(qn, qd, q) AS (VALUES (1, 2, 0.5), (19, 20, 0.95), (99, 100, 0.99))
    SELECT event_type, q.q AS q,
           (MIN(CASE WHEN cum >= (q.qn * total + q.qd - 1) // q.qd
                     THEN bin END) + 1) * 100 / 100.0 AS est_upper
    FROM c, q
    GROUP BY 1, 2
    """,
)
def streaming_value_quantiles(spark, sf_dir):
    """STREAMING mergeable quantiles: the binned histogram is a plain
    streaming aggregation on (event_type, bin) — counts maintained in
    the state store, mergeable across microbatches by construction
    (the same property that lets the batch partials roll up) — and the
    rank read-off runs on the final materialized counts. Same
    integer-exact bins and rational rank targets as the batch row
    (`event_value_quantile_rollup`), same bit-for-bit oracle."""
    from ..operators.histogram import linear_bin, quantile_bins

    ev = replay_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    hist = ev.groupBy(
        "event_type", linear_bin(cents, 0, 60_000, 600).alias("bin")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    final = run_to_memory(hist, output_mode="complete")
    qb = quantile_bins(final, ["event_type"], [0.5, 0.95, 0.99])
    return qb.select(
        "event_type",
        "q",
        ((F.col("qbin") + 1) * 100 / F.lit(100.0)).alias("est_upper"),
    )


@register(
    "streaming_heavy_tokens",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
      FROM documents WHERE text IS NOT NULL
    ), nn AS (
      SELECT token FROM toks WHERE token <> ''
    ), t AS (SELECT count(*) AS n FROM nn)
    SELECT token, CAST(count(*) AS BIGINT) AS cnt,
           round(CAST(count(*) AS DOUBLE) / any_value(t.n), 6) AS share
    FROM nn, t
    GROUP BY token
    HAVING count(*) > 0.03 * any_value(t.n)
    """,
)
def streaming_heavy_tokens(spark, sf_dir):
    """STREAMING heavy hitters (streaming/heavy.py): Misra-Gries
    counter sets maintained in the state store across 6 sequential
    microbatches of the document stream (items shard by hash, each
    shard owns its items' full counts, so the per-shard MG survival
    guarantee covers the whole stream), then the drained candidate
    superset is recounted EXACTLY against the stored corpus — output
    identical to the batch `corpus_heavy_tokens` row, same plain
    GROUP BY/HAVING oracle. Registered outside the 50-row gate
    (full_registry tooling + pytest); the batch row carries the gate
    slot."""
    from ..streaming.heavy import (
        final_candidates,
        heavy_hitter_candidates_stream,
        recount_exact,
    )
    from ..streaming.replay import replay_table_multibatch
    from . import table

    tok = F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    docs = replay_table_multibatch(
        spark, sf_dir, "documents", n_files=6, order_col="doc_id"
    ).where(F.col("text").isNotNull())
    stream_toks = docs.select(tok).where(F.col("token") != "")
    emitted = run_to_memory(
        heavy_hitter_candidates_stream(stream_toks, "token", k=67),
        output_mode="update",
    )
    static_toks = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(tok)
        .where(F.col("token") != "")
    )
    return recount_exact(static_toks, "token", final_candidates(emitted), phi=0.03)


# ------------------------------------------------ streaming CDC
from .relational2 import CDC_ORACLE as _CDC_ORACLE  # noqa: E402


def _orders_changelog_stream(spark, sf_dir):
    """The orders_cdc_snapshot seeding as a STREAM: replay orders and
    expand each order into its 1-4 change events with a stateless
    struct-array explode (same versions, same (ts, seq) tiebreaks)."""
    from ..streaming.replay import replay_table

    o = replay_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")

    def ver(keep, op, seq, cust, status, price):
        return F.struct(
            keep.alias("keep"), F.lit(op).alias("op"),
            F.lit(seq).cast("int").alias("seq"), cust.alias("o_custkey"),
            status.alias("o_orderstatus"), price.alias("o_totalprice"),
        )

    versions = F.array(
        ver(F.lit(True), "I", 1, F.col("o_custkey"),
            F.col("o_orderstatus"), F.col("o_totalprice")),
        ver(k % 3 == 0, "U", 2, F.col("o_custkey"),
            F.col("o_orderstatus"), F.col("o_totalprice") + F.lit(100.0)),
        ver(k % 7 == 0, "D", 3, F.lit(None).cast("long"),
            F.lit(None).cast("string"), F.lit(None).cast("double")),
        ver(k % 21 == 0, "I", 4, F.col("o_custkey"),
            F.lit("R"), F.lit(0.0)),
    )
    v = F.explode(F.filter(versions, lambda s: s.keep)).alias("v")
    return o.select(
        "o_orderkey", F.unix_micros(F.col("o_orderdate")).alias("ts"), v
    ).select(
        "o_orderkey", "v.op", "ts", "v.seq",
        "v.o_custkey", "v.o_orderstatus", "v.o_totalprice",
    )


@register("streaming_cdc_snapshot", oracle=_CDC_ORACLE)
def streaming_cdc_snapshot(spark, sf_dir):
    """Streaming CDC apply (streaming/cdc.py cdc_snapshot_stream):
    the orders changelog as a stream, folded per key into state-store
    latest images (applyInPandasWithState — one image per key, never
    history), then the emission log compacted by the BATCH
    cdc_compact — output identical to orders_cdc_snapshot however
    the stream was batched (same CDC_ORACLE as the batch row)."""
    from ..operators.cdc import cdc_compact
    from ..streaming.cdc import cdc_snapshot_stream
    from ..streaming.replay import run_to_memory

    log = _orders_changelog_stream(spark, sf_dir)
    emitted = run_to_memory(
        cdc_snapshot_stream(log, "o_orderkey", ts_col="ts", seq_col="seq"),
        output_mode="append",
    )
    return cdc_compact(emitted, "o_orderkey", "ts", tiebreak="seq")

