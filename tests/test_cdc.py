"""CDC changelog compaction (operators/cdc.py)."""

import pytest

from malstrom_spark.operators.cdc import cdc_compact, cdc_deduplicate_log


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "k string, op string, ts long, seq int, val string, n long"
    )


def test_latest_wins_and_delete(spark):
    log = _log(spark, [
        ("a", "I", 1, 1, "a1", 10),
        ("a", "U", 2, 1, "a2", 20),
        ("b", "I", 1, 1, "b1", 1),
        ("b", "D", 3, 1, None, None),
        ("c", "I", 5, 1, "c1", 7),
    ])
    out = cdc_compact(log, "k", "ts", tiebreak="seq")
    got = {r["k"]: (r["val"], r["n"]) for r in out.collect()}
    assert got == {"a": ("a2", 20), "c": ("c1", 7)}
    assert out.columns == ["k", "val", "n"]


def test_delete_then_reinsert_revives(spark):
    log = _log(spark, [
        ("a", "I", 1, 1, "v1", 1),
        ("a", "D", 2, 1, None, None),
        ("a", "I", 3, 1, "v2", 2),
    ])
    got = cdc_compact(log, "k", "ts").collect()
    assert [(r["k"], r["val"], r["n"]) for r in got] == [("a", "v2", 2)]


def test_tiebreak_decides_equal_ts(spark):
    log = _log(spark, [
        ("a", "I", 1, 1, "first", 1),
        ("a", "U", 1, 2, "second", 2),
        ("a", "U", 1, 3, "third", 3),
    ])
    got = cdc_compact(log, "k", "ts", tiebreak="seq").collect()
    assert got[0]["val"] == "third"


def test_keep_meta_and_custom_delete_ops(spark):
    log = _log(spark, [
        ("a", "ins", 1, 1, "x", 1),
        ("b", "ins", 1, 1, "y", 1),
        ("b", "del", 2, 1, None, None),
    ])
    out = cdc_compact(
        log, "k", "ts", tiebreak="seq", delete_ops=("del",), keep_meta=True
    )
    rows = out.collect()
    assert {r["k"] for r in rows} == {"a"}
    assert set(out.columns) == {"k", "op", "ts", "seq", "val", "n"}
    assert rows[0]["op"] == "ins"


def test_composite_key(spark):
    df = spark.createDataFrame(
        [("a", 1, "I", 1, "x"), ("a", 2, "I", 1, "y"), ("a", 1, "U", 2, "z")],
        "k1 string, k2 int, op string, ts long, val string",
    )
    got = {(r["k1"], r["k2"]): r["val"]
           for r in cdc_compact(df, ["k1", "k2"], "ts").collect()}
    assert got == {("a", 1): "z", ("a", 2): "y"}


def test_missing_column_raises(spark):
    df = spark.createDataFrame([("a", 1)], "k string, ts long")
    with pytest.raises(ValueError, match="missing column"):
        cdc_compact(df, "k", "ts")  # no 'op' column


def test_dedup_log_collapses_runs(spark):
    log = _log(spark, [
        ("a", "I", 1, 1, "same", 1),
        ("a", "U", 2, 1, "same", 1),   # no-op re-emit -> dropped
        ("a", "U", 3, 1, "diff", 1),
        ("a", "U", 4, 1, "diff", 1),   # dropped
        ("a", "U", 5, 1, "same", 1),   # back to 'same' -> real change, kept
    ])
    out = cdc_deduplicate_log(log, "k", "ts", tiebreak="seq",
                              attrs=["val", "n"])
    assert [r["ts"] for r in out.sort("ts").collect()] == [1, 3, 5]


def test_compact_plan_shape(spark):
    """Scale shape: compaction is a max_by aggregate with a map-side
    partial combine — exactly one Exchange, a partial_max_by BELOW it
    (at most one row per key per task crosses the wire), and zero
    WindowExec (the row_number formulation would shuffle the full
    log)."""
    log = _log(spark, [("a", "I", 1, 1, "x", 1)])
    plan = cdc_compact(log, "k", "ts", tiebreak="seq")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") == 1
    map_side = plan.split("Exchange")[1]  # text below the Exchange line
    assert "partial_max_by" in map_side


def test_null_op_is_upsert_not_delete(spark):
    """A malformed changelog row with NULL op must not silently delete
    the key (isin() is NULL for NULL, and where() drops NULL): the
    latest NULL-op image is treated as an upsert."""
    df = spark.createDataFrame(
        [("a", "I", 1, "x"), ("a", None, 2, "y"), ("b", "D", 1, "z")],
        "k string, op string, ts long, val string",
    )
    got = {r["k"]: r["val"] for r in cdc_compact(df, "k", "ts").collect()}
    assert got == {"a": "y"}  # NULL-op latest image survives; b deleted


def test_dedup_log_empty_attrs_keeps_first(spark):
    """A changelog of bare keys+ts (no tracked attrs) gets defined
    keep-first semantics instead of a py4j NPE from `is_first | None`."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "k string, ts long")
    out = cdc_deduplicate_log(df, "k", "ts", attrs=[])
    assert sorted((r["k"], r["ts"]) for r in out.collect()) == \
        [("a", 1), ("b", 5)]
