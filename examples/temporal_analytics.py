"""Temporal analytics suite — no reference analog (the reference has
no joins, windows, or warehouse operators; SURVEY §2.8): the four
time-centric operators added in round 4 composed over the events
table. Shows the intended workflow of each:

- range_join: attribute events to per-user purchase lookback windows;
- hypertable_rollup: hour partials once, day/week derived (exchange
  reuse — the continuous-aggregate decomposition);
- funnel_counts: signup -> click -> purchase conversion in order;
- scd2_history: each user's event-type "state" as type-2 intervals.
"""

from pyspark.sql import functions as F

from malstrom_spark.operators.funnel import funnel_counts
from malstrom_spark.operators.rangejoin import range_join
from malstrom_spark.operators.scd import scd2_history
from malstrom_spark.operators.windows import hypertable_rollup

SF_DIR = "/root/testdata/sf0.001"


def main(spark, sf_dir: str = SF_DIR):
    from malstrom_spark.queries import table

    ev = table(spark, sf_dir, "events")

    # 1. range join: events inside [purchase - 4h, purchase)
    windows = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 4 HOURS")).alias("s"),
        F.col("ts").alias("e"),
    )
    attributed = range_join(
        ev.select("user_id", "ts", "value"), windows, "ts", "s", "e",
        keys=["user_id"],
    )
    n_pairs = attributed.count()

    # 2. hypertable rollup: hour -> day -> week off one raw shuffle
    rollup = hypertable_rollup(
        ev, "ts", keys=["event_type"],
        aggs={"n": ("count", F.lit(1)), "mx": ("max", F.col("value"))},
        grains=("hour", "day", "week"),
    )
    grains = {r.grain for r in rollup.select("grain").distinct().collect()}
    assert grains == {"hour", "day", "week"}, grains

    # 3. funnel: ordered conversion within 7 days of first signup
    funnel = funnel_counts(
        ev, "user_id", "ts",
        [
            ("signup", F.col("event_type") == "signup"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
        within="7 days",
    ).collect()
    counts = [r.n_users for r in sorted(funnel, key=lambda r: r.step_idx)]
    assert counts == sorted(counts, reverse=True), counts  # monotone

    # 4. SCD2: per-user event-type intervals (audit-style history)
    hist = scd2_history(
        ev, key="user_id", ts="ts", attrs=["event_type"], tiebreak="event_id"
    )
    current = hist.filter("is_current").count()
    n_users = ev.select("user_id").distinct().count()
    assert current == n_users, (current, n_users)  # exactly one open row per key

    # 5. point-in-time lookup (round 5): each purchase reads the user
    # state interval containing its timestamp from the SCD2 dim
    from malstrom_spark.operators.scd import scd2_lookup

    dim = hist.select(
        "user_id", F.col("event_type").alias("state"), "valid_from", "valid_to"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    looked = scd2_lookup(purchases, dim, key="user_id", ts="ts")
    assert looked.count() == purchases.count()  # exactly one interval each
    assert looked.filter("state IS NULL").count() == 0  # facts inside history

    # 6. mergeable rollups (round 5): HLL distinct users + histogram
    # p95 per day, both decomposable through persisted partials
    from malstrom_spark.operators.histogram import (
        histogram, linear_bin, quantile_bins,
    )

    hll = hypertable_rollup(
        ev, "ts", keys=[],
        aggs={"users": ("approx_distinct", F.col("user_id"))},
        grains=("day",),
    )
    day_users = {r.bucket: r.users for r in hll.collect()}
    assert all(u > 0 for u in day_users.values())

    cents = F.round(F.col("value") * 100).cast("long")
    day_hist = histogram(
        ev.withColumn("bucket", F.date_trunc("day", "ts")),
        ["bucket"], linear_bin(cents, 0, 60_000, 600),
    )
    p95 = quantile_bins(day_hist, ["bucket"], [0.95]).collect()
    assert len(p95) == len(day_users) and all(r.qbin >= 0 for r in p95)

    return {
        "attributed_pairs": n_pairs,
        "funnel": counts,
        "current_rows": current,
        "pit_lookups": looked.count(),
        "days_with_quantiles": len(p95),
    }


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="example-temporal")))
