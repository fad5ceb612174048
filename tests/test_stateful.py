"""Golden tests for batch stateful ops — mirrors the reference's
stateful_map running-sum + state-drop tests (stateful_map.rs:126-189)
and ttl_map expiry tests (ttl_map.rs:117-209)."""

import pyspark.sql.functions as F
import pytest

from malstrom_spark.operators import stateful


@pytest.fixture(scope="module")
def kv(spark):
    # parity-keyed values, reference stateful_map.rs:126-156 (key = v & 1)
    rows = [(i, i % 2, i) for i in range(20)]
    return spark.createDataFrame(rows, "seq long, key long, value long")


def test_running_agg_sum(kv):
    out = stateful.running_agg(kv, ["key"], ["seq"], {"run": F.sum("value")})
    got = {(r.key, r.seq): r.run for r in out.collect()}
    # golden: running sum per parity class in seq order
    expect = {}
    acc = {0: 0, 1: 0}
    for i in range(20):
        acc[i % 2] += i
        expect[(i % 2, i)] = acc[i % 2]
    assert got == expect


def test_stateful_map_fold_and_emit(kv, spark):
    # arbitrary fold: emit (value, state_before); state = count of records seen
    def fn(key, row, state):
        state = state or 0
        return {"key": key[0], "seq": row["seq"], "seen_before": state}, state + 1

    out = stateful.stateful_map(kv, ["key"], ["seq"], fn, "key long, seq long, seen_before long")
    got = {(r.key, r.seq): r.seen_before for r in out.collect()}
    assert got[(0, 0)] == 0 and got[(0, 2)] == 1 and got[(0, 18)] == 9
    assert got[(1, 1)] == 0 and got[(1, 19)] == 9


def test_stateful_map_state_drop(spark):
    # reference semantics: returning state=None drops the key's state
    df = spark.createDataFrame([(i, "k") for i in range(6)], "seq long, key string")

    def fn(key, row, state):
        state = (state or 0) + 1
        if state == 3:  # drop after 3 records -> counter restarts
            return {"seq": row["seq"], "cnt": state}, None
        return {"seq": row["seq"], "cnt": state}, state

    out = stateful.stateful_map(df, ["key"], ["seq"], fn, "seq long, cnt long")
    counts = [r.cnt for r in sorted(out.collect(), key=lambda r: r.seq)]
    assert counts == [1, 2, 3, 1, 2, 3]


def test_ttl_map_expiry(spark):
    # reference ttl_map.rs: state entries expire when event time passes expiry
    rows = [(0, "k", 10), (1, "k", 11), (2, "k", 25)]  # ts jumps past ttl
    df = spark.createDataFrame(rows, "seq long, key string, ts long")

    def fn(key, row, live):
        out = {"seq": row["seq"], "n_live": len(live)}
        # insert an entry expiring 10 ticks after this record
        return out, {row["seq"]: (row["ts"] + 10, "v")}

    out = stateful.ttl_map(df, ["key"], ["seq"], "ts", 10, fn, "seq long, n_live long")
    got = {r.seq: r.n_live for r in out.collect()}
    # seq0 sees empty; seq1 sees 1 live (expiry 20 > 11); seq2 at ts=25 sees
    # both earlier entries expired (20 <= 25, 21 <= 25)
    assert got == {0: 0, 1: 1, 2: 0}
