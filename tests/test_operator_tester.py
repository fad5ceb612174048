"""OperatorTester harness (malstrom_spark/testing.py) — parity with
the reference's testing module: stepwise microbatch feeding, per-batch
output capture, and capture/restore state continuity across restart
(testing/operator_tester.rs:23-91, testing/mod.rs:40-75)."""

from pyspark.sql import functions as F


def test_operator_tester_stepwise_and_restart(spark, tmp_path):
    from malstrom_spark.streaming.stateful import running_totals_stream
    from malstrom_spark.testing import OperatorTester

    t = OperatorTester(
        spark,
        "user_id long, value double",
        op=lambda sdf: running_totals_stream(sdf, "user_id", "value"),
        work_dir=str(tmp_path / "opt"),
    )
    try:
        t.send([(1, 2.0), (2, 3.0)])
        out1 = t.step()
        assert len(out1) == 1  # one microbatch in, one out
        totals = {r.user_id: r.total_value for r in out1[0]}
        assert totals == {1: 2.0, 2: 3.0}

        t.send([(1, 5.0)])
        t.send([(2, 1.0)])
        out2 = t.step()
        assert len(out2) == 2  # two sends -> two microbatches
        assert {r.user_id: r.total_value for r in out2[0]} == {1: 7.0}
        assert {r.user_id: r.total_value for r in out2[1]} == {2: 4.0}

        # capture/restore: state and offsets survive a restart
        t.restart()
        t.send([(1, 1.0)])
        out3 = t.step()
        assert {r.user_id: r.total_value for r in out3[0]} == {1: 8.0}
    finally:
        t.stop()


def test_operator_tester_stateless_op(spark, tmp_path):
    from malstrom_spark.testing import OperatorTester

    t = OperatorTester(
        spark,
        "x long",
        op=lambda sdf: sdf.select((F.col("x") * 2).alias("y")).where(F.col("y") > 2),
        work_dir=str(tmp_path / "opt2"),
    )
    try:
        t.send([(1,), (2,), (3,)])
        out = t.step()
        assert sorted(r.y for r in out[0]) == [4, 6]
    finally:
        t.stop()
