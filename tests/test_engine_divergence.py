"""Engine-divergence pinning for `stateful_op_stream`'s two paths
(SURVEY §2.3 hard part #1; reference ordering spec stateful_op.rs:
14-103,154-157).

The TWS path (`transformWithStateInPandas`) arms EVERY timer the
logic returns; the apws fallback (`applyInPandasWithState`) can hold
only ONE pending timer per key, so it arms the earliest and relies on
`on_timer` re-arming the rest. These tests drive both wrappers'
pure-Python logic (module-level `make_tws_processor` /
`make_apws_wrapped`) with fake handles — no Spark session, no
protobuf runtime — and assert the two engines produce IDENTICAL
cumulative outputs and state for arbitrary multi-timer schedules.

Known, documented divergence NOT asserted away: `on_timer`'s
`fired_at_ms` is the timer's expiry in TWS but the current watermark
in apws — logic must treat it as "the frontier has passed this
point" (all shipped operators do); outputs derived from it pin
equality of the SET of closed work, not of the raw argument.
"""

from __future__ import annotations

from types import SimpleNamespace

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from malstrom_spark.streaming.stateful_op import (
    _has_protobuf,
    make_apws_wrapped,
    make_tws_processor,
)

WIN = 100  # window length for the test logic (logical ms)


# ------------------------------------------------------- test logic
# Multi-window-per-key counting: on_data opens a window per ts bucket
# and requests a timer for EVERY open window end (the multi-timer
# case); on_timer closes every window <= fired_at, emits, and re-arms
# for the remainder.
def on_data(key, batches, state, timer_values):
    ends, counts = (list(state[0]), list(state[1])) if state else ([], [])
    for batch in batches:
        for ts in batch:
            end = (ts // WIN) * WIN + WIN
            if end in ends:
                counts[ends.index(end)] += 1
            else:
                ends.append(end)
                counts.append(1)
    return [], (ends, counts), sorted(ends)


def on_timer(key, fired_at_ms, state):
    if state is None:
        return [], None, []
    ends, counts = list(state[0]), list(state[1])
    closed = sorted((i for i, e in enumerate(ends) if e <= fired_at_ms),
                    key=lambda i: ends[i])
    outs = [(key, ends[i], counts[i]) for i in closed]
    keep = [i for i in range(len(ends)) if i not in closed]
    if not keep:
        return outs, None, []
    kept = ([ends[i] for i in keep], [counts[i] for i in keep])
    return outs, kept, sorted(kept[0])


# ------------------------------------------------------ fake engines
class _FakeValueState:
    def __init__(self):
        self._v, self._exists = None, False

    def exists(self):
        return self._exists

    def get(self):
        return self._v

    def update(self, v):
        self._v, self._exists = tuple(v), True

    def clear(self):
        self._v, self._exists = None, False


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.timers: set[int] = set()

    def getValueState(self, name, schema):
        return self.state

    def registerTimer(self, t_ms):
        self.timers.add(int(t_ms))


class TwsEngine:
    """transformWithStateInPandas semantics: a set of pending timers
    per key; on watermark advance, each due timer fires individually
    in expiry order (timers registered during firing that are already
    due fire in the same drain)."""

    def __init__(self):
        self.handle = _FakeHandle()
        self.op = make_tws_processor(on_data, on_timer, state_schema=None)()
        self.op.init(self.handle)

    def data(self, key, batch):
        return list(self.op.handleInputRows(key, iter([batch]), None))

    def advance(self, key, wm):
        outs = []
        while True:
            due = sorted(t for t in self.handle.timers if t <= wm)
            if not due:
                return outs
            t = due[0]
            self.handle.timers.discard(t)
            info = SimpleNamespace(getExpiryTimeInMs=lambda t=t: t)
            outs += list(self.op.handleExpiredTimer(key, None, info))

    def state(self):
        return self.handle.state.get()


class _FakeGroupState:
    def __init__(self):
        self._v, self._exists = None, False
        self.timeout = None
        self.hasTimedOut = False
        self.wm = 0

    @property
    def exists(self):
        return self._exists

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self._exists = tuple(v), True

    def remove(self):
        self._v, self._exists, self.timeout = None, False, None

    def setTimeoutTimestamp(self, t_ms):
        self.timeout = int(t_ms)

    def getCurrentWatermarkMs(self):
        return self.wm


class ApwsEngine:
    """applyInPandasWithState semantics: ONE pending timeout per key;
    when the watermark passes it the wrapper runs with hasTimedOut and
    may re-arm; a re-armed timeout already past the watermark fires on
    the next drain iteration (next microbatch in the real engine)."""

    def __init__(self):
        self.wrapped = make_apws_wrapped(on_data, on_timer)
        self.gs = _FakeGroupState()

    def data(self, key, batch):
        self.gs.hasTimedOut = False
        return list(self.wrapped(key, iter([batch]), self.gs))

    def advance(self, key, wm):
        self.gs.wm = wm
        outs = []
        while (
            self.gs.timeout is not None
            and self.gs.timeout <= wm
            and self.gs._exists
        ):
            self.gs.timeout = None  # engine clears before invoking
            self.gs.hasTimedOut = True
            outs += list(self.wrapped(key, iter([]), self.gs))
        self.gs.hasTimedOut = False
        return outs

    def state(self):
        return self.gs._v


def _canon_state(s):
    if s is None:
        return None
    return tuple(sorted(zip(s[0], s[1])))


def _run_both(steps):
    """Drive both engines through (kind, payload) steps; compare
    cumulative outputs and canonical state after EVERY step."""
    key = ("k",)
    tws, apws = TwsEngine(), ApwsEngine()
    out_t, out_a = [], []
    wm = 0
    for kind, payload in steps:
        if kind == "data":
            out_t += tws.data(key, payload)
            out_a += apws.data(key, payload)
        else:
            wm = max(wm, payload)
            out_t += tws.advance(key, wm)
            out_a += apws.advance(key, wm)
        assert out_t == out_a, f"output divergence after {kind}({payload})"
        assert _canon_state(tws.state()) == _canon_state(apws.state())
    return out_t


def test_multi_timer_schedule_deterministic():
    """Three windows opened in one batch; watermark passes them across
    three advances — the 2nd/3rd emissions happen only via re-armed
    timers on the apws path (the key never sees data again)."""
    outs = _run_both(
        [
            ("data", [10, 110, 250, 15]),  # windows 100, 200, 300
            ("wm", 100),                   # closes window 100
            ("wm", 205),                   # closes window 200
            ("wm", 50),                    # no-op (non-monotone ignored)
            ("wm", 300),                   # closes window 300
        ]
    )
    assert outs == [(("k",), 100, 2), (("k",), 200, 1), (("k",), 300, 1)]


def test_single_advance_closes_all_due_windows():
    """One big watermark jump: TWS fires 3 separate expiries, apws
    fires once at the watermark — identical cumulative output."""
    outs = _run_both([("data", [10, 110, 250]), ("wm", 1000)])
    assert outs == [(("k",), 100, 1), (("k",), 200, 1), (("k",), 300, 1)]


def test_timers_with_none_state_raise_on_both_paths():
    """Contract invariant (module docstring): requesting timers while
    returning new_state=None must raise identically on both engines."""

    def bad_on_data(key, batches, state, timer_values):
        return [], None, [123]

    wrapped = make_apws_wrapped(bad_on_data, on_timer)
    gs = _FakeGroupState()
    with pytest.raises(ValueError, match="new_state=None"):
        list(wrapped(("k",), iter([[1]]), gs))

    op = make_tws_processor(bad_on_data, on_timer, state_schema=None)()
    op.init(_FakeHandle())
    with pytest.raises(ValueError, match="new_state=None"):
        list(op.handleInputRows(("k",), iter([[1]]), None))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.tuples(
                st.just("data"),
                st.lists(st.integers(min_value=0, max_value=999), min_size=1, max_size=5),
            ),
            st.tuples(st.just("wm"), st.integers(min_value=0, max_value=1200)),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_property_multi_timer_divergence(steps):
    """Arbitrary interleavings of data batches and (monotone-clamped)
    watermark advances: both engine paths must agree on cumulative
    output AND state after every step."""
    _run_both(steps)


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs the protobuf package at "
    "runtime (state-server protocol); absent in this environment — "
    "the TWS wrapper logic is pinned by the fake-engine tests above",
)
def test_tws_integration_monthly_balance(spark, tmp_path):
    """Real transformWithStateInPandas run (auto-activates wherever
    protobuf exists): same monthly-balance program as the apws test in
    test_stateful_op_timers.py, forced down the TWS path."""
    from datetime import datetime

    import pandas as pd

    from malstrom_spark.streaming.stateful_op import _via_transform_with_state

    def on_data_mb(key, pdfs, state, timer_values):
        total = state[1] if state else 0.0
        month, end_ms = (state[0] if state else None), None
        for pdf in pdfs:
            ts = pdf["ts"].iloc[0]
            nxt = (ts.to_period("M") + 1).to_timestamp()
            month = month or ts.strftime("%Y-%m")
            end_ms = int(nxt.timestamp() * 1000)
            total += float(pdf["amount"].sum())
        return [], (month, total), ([end_ms] if end_ms else [])

    def on_timer_mb(key, fired_at_ms, state):
        if state is None:
            return [], None, []
        month, total = state
        out = pd.DataFrame({"account": [key[0]], "month": [month], "balance": [total]})
        return [out], None, []

    staging = tmp_path / "in"
    staging.mkdir()
    schema = "account string, ts timestamp, amount double"
    spark.createDataFrame(
        [("a", datetime(2024, 1, 5), 10.0)], schema
    ).coalesce(1).write.parquet(str(staging / "b0"))
    spark.createDataFrame(
        [("z", datetime(2024, 3, 10), 1.0)], schema
    ).coalesce(1).write.parquet(str(staging / "b1"))
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(staging) + "/b*")
        .withWatermark("ts", "0 seconds")
    )
    out = _via_transform_with_state(
        sdf, ["account"], on_data_mb, on_timer_mb,
        "account string, month string, balance double",
        "month string, total double", "eventTime",
    )
    q = (
        out.writeStream.format("memory").queryName("tws_monthly")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = {(r.account, r.month): r.balance for r in spark.table("tws_monthly").collect()}
    assert rows[("a", "2024-01")] == pytest.approx(10.0)
