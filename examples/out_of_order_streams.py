"""Out-of-order streams end-to-end (round 5) — the disorder_horizon
mode of the streaming funnel and SCD2 twins, driven batch-by-batch
through the OperatorTester harness exactly as a user would test their
own topology.

The reference's event-time model buffers within a disorder bound and
finalizes work when the frontier (epoch/watermark) passes
(generate_epochs -> on_epoch; operators/time/generate_epochs.rs:39-127,
stateful_op.rs:154-157). Here the same contract on Structured
Streaming: events arriving out of order ACROSS microbatches land in
their correct event-time position as long as they are inside the
horizon; a beyond-horizon straggler is deterministically dropped.
"""

import datetime as dt

from pyspark.sql import functions as F

from malstrom_spark.streaming.funnel import funnel_stream
from malstrom_spark.streaming.scd import scd2_stream
from malstrom_spark.testing import OperatorTester

BASE = dt.datetime(2024, 6, 1, 9, 0, 0)


def _m(minutes):
    return BASE + dt.timedelta(minutes=minutes)


def main(spark):
    # ---------- funnel: the 'click' arrives one microbatch LATE ----------
    steps = [
        ("signup", F.col("event_type") == "signup"),
        ("click", F.col("event_type") == "click"),
        ("purchase", F.col("event_type") == "purchase"),
    ]
    t = OperatorTester(
        spark,
        "user_id long, ts timestamp, event_type string",
        op=lambda sdf: funnel_stream(
            sdf, "user_id", "ts", steps, within="1 hour",
            disorder_horizon="15 minutes",
        ),
    )
    try:
        # batch 1 delivers signup@0 and purchase@10 — but NOT the click
        t.send([(1, _m(0), "signup"), (1, _m(10), "purchase")])
        t.step()
        # batch 2 delivers the click@5 late (still inside the horizon)
        t.send([(1, _m(5), "click")])
        t.step()
        # a far-future step event flushes the watermark past everything
        t.send([(999, _m(24 * 60), "signup")])
        rows = [r for b in t.step() for r in b if r.u == 1]
    finally:
        t.stop()
    final = rows[-1]
    # the late click landed BETWEEN signup and purchase: full chain
    assert (final.t_signup, final.t_click, final.t_purchase) == (
        _m(0), _m(5), _m(10),
    ), final
    # a fill-forward (default-mode) twin would have nulled the chain at
    # 'click' in batch 1 and could never place purchase after it

    # ---------- SCD2: a state change arrives late, mid-chain ----------
    t2 = OperatorTester(
        spark,
        "user_id long, ts timestamp, event_id long, plan string",
        op=lambda sdf: scd2_stream(
            sdf, key="user_id", ts="ts", attrs=["plan"], tiebreak="event_id",
            disorder_horizon="15 minutes",
        ),
    )
    try:
        t2.send([(7, _m(0), 1, "free"), (7, _m(20), 3, "enterprise")])
        t2.step()
        t2.send([(7, _m(10), 2, "pro")])  # late upgrade, inside horizon
        t2.step()
        t2.send([(999, _m(24 * 60), 9, "free")])  # watermark flush
        rows2 = [r for b in t2.step() for r in b if r.user_id == 7]
    finally:
        t2.stop()
    # latest version per interval (valid_to closes exactly once)
    latest = {}
    for r in rows2:
        k = (r.plan, r.valid_from)
        if k not in latest or (latest[k] is None and r.valid_to is not None):
            latest[k] = r.valid_to
    history = sorted((vf, p, vt) for (p, vf), vt in latest.items())
    assert history == [
        (_m(0), "free", _m(10)),
        (_m(10), "pro", _m(20)),
        (_m(20), "enterprise", None),
    ], history

    # ---------- the generic form: any custom fold, event-time ordered ----------
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType, TimestampType,
    )

    from malstrom_spark.streaming.disorder import stateful_map_ordered_stream

    out_schema = StructType([
        StructField("account", LongType()),
        StructField("ts", TimestampType()),
        StructField("balance", DoubleType()),
    ])

    def running_balance(key, pdf, state):
        bal = state[0] if state is not None and state[0] is not None else 0.0
        out = []
        for _, r in pdf.iterrows():
            bal = round(bal + r["amount"], 2)
            out.append({"account": key[0], "ts": r["ts"], "balance": bal})
        return [pd.DataFrame(out)], (bal,)

    t3 = OperatorTester(
        spark,
        "account long, ts timestamp, amount double",
        op=lambda sdf: stateful_map_ordered_stream(
            sdf, ["account"], "ts", running_balance, out_schema,
            "bal double", disorder_horizon="15 minutes",
        ),
    )
    try:
        rows3 = []
        t3.send([(42, _m(0), 100.0), (42, _m(20), -30.0)])
        rows3 += [r for b in t3.step() for r in b]
        t3.send([(42, _m(10), 50.0)])  # late deposit, inside horizon
        rows3 += [r for b in t3.step() for r in b]
        t3.send([(999, _m(24 * 60), 0.0)])
        rows3 += [r for b in t3.step() for r in b]
        rows3 = [r for r in rows3 if r.account == 42]
    finally:
        t3.stop()
    balances = [r.balance for r in sorted(rows3, key=lambda r: r.ts)]
    # the late deposit lands between the two batch-1 events, so the
    # final balance sequence is 100 -> 150 -> 120 (not 100 -> 70 -> 120)
    assert balances == [100.0, 150.0, 120.0], balances

    return {
        "funnel_chain": (final.t_signup, final.t_click, final.t_purchase),
        "scd2_intervals": len(history),
        "balance_sequence": balances,
    }


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="out-of-order-example")))
