"""VERDICT r12 item #7: prove the SHJ config's skew story at sf1.

build_session sets spark.sql.join.preferSortMergeJoin=false and
spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m (round 12).
The adversarial case: a skewed build side whose hot partition sits at /
past the 64 MB bound. This probe runs three joins at sf1 and books, for
each, the wall time and the join operators in the FINAL adaptive plan
(executedPlan after the action — AQE rewrites never show in explain):

  A. benign: lineitem x orders on o_orderkey (uniform keys)
  B. skewed-small: 50% of the probe side hashed onto ONE hot key, build
     side small (fits any per-partition bound) -> expect SHJ + AQE
     skew-split of the probe side
  C. skewed-big-build: the BUILD side itself carries the hot key with a
     wide payload so its hot partition exceeds 64 MB -> the AQE rewrite
     must NOT fire for that partition; expect SortMergeJoin (fallback)
     or a skew-split SMJ — and, critically, no OOM.

Each case also runs with the round-12 conf flipped OFF (SMJ preferred,
threshold 0) as the control. One JSON line at the end.

Usage: python tools/probe_r13_shj_skew.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def joins_in_final_plan(df) -> dict:
    s = df._jdf.queryExecution().executedPlan().toString()
    return {
        "SortMergeJoin": len(re.findall(r"SortMergeJoin", s)),
        "ShuffledHashJoin": len(re.findall(r"ShuffledHashJoin", s)),
        "BroadcastHashJoin": len(re.findall(r"BroadcastHashJoin", s)),
        "skewed": "isSkew=true" in s or "skewed" in s,
        "AQEShuffleRead": len(re.findall(r"AQEShuffleRead", s)),
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/sfdata/sf1"
    from malstrom_spark.session import build_session

    out: dict[str, dict] = {}
    for conf_on in (True, False):
        extra = {"spark.ui.enabled": "false"}
        if not conf_on:
            extra["spark.sql.join.preferSortMergeJoin"] = "true"
            extra["spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"] = "0"
        spark = build_session(
            app_name=f"probe-shj-skew-{conf_on}", extra_conf=extra
        )
        # autoBroadcast would hide the shuffle joins this probe is about
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # skew thresholds: session defaults unless SHJ_PROBE_AGGRESSIVE
        # (8m/4m manufactures ~475 splits; the default 256m/64m is what
        # production sees — both modes booked in OPTIMIZATION_r13.md)
        if os.environ.get("SHJ_PROBE_AGGRESSIVE"):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "8m",
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m"
            )

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        od = spark.read.parquet(f"{sf_dir}/orders.parquet")

        # A: benign equi-join
        a_big = li.select("l_orderkey", "l_extendedprice")
        a_small = od.select("o_orderkey", "o_totalprice")
        # incompressible, per-row-distinct ~640 B pad: constant pads
        # compress to nothing in the shuffle and constant lengths fold
        # out of the aggregate — both defeat the point of the probe
        def wide_pad(key_col):
            return F.concat(*[
                F.sha2(
                    F.concat(key_col.cast("string"), F.lit(str(i))).cast("binary"),
                    256,
                )
                for i in range(10)
            ])

        # B: skewed probe side (50% of rows on key 0), small build side
        b_big = li.select(
            F.when(F.col("l_linenumber") <= 3, F.lit(0))
            .otherwise(F.col("l_orderkey"))
            .alias("k"),
            "l_extendedprice",
            wide_pad(F.col("l_partkey")).alias("pad"),
        )
        b_small = od.select(
            F.col("o_orderkey").alias("k"), "o_totalprice"
        ).where(F.col("k") % 7 == 0)
        # C: the BUILD side carries the hot key + wide payload
        c_build = li.select(
            F.when(F.col("l_linenumber") <= 3, F.lit(0))
            .otherwise(F.col("l_orderkey"))
            .alias("k"),
            wide_pad(F.col("l_suppkey")).alias("pad"),
        )
        c_probe = od.select(F.col("o_orderkey").alias("k"), "o_totalprice")

        # aggregates hash pad TOGETHER WITH a column from the other
        # side, so the pad bytes must cross their exchange in full
        # (any single-side scalar would be projected below it)
        def consume(pad_col, other_col):
            return F.sum(
                F.xxhash64(F.concat(pad_col, other_col.cast("string")))
                % F.lit(1_000_000)
            ).alias("n")

        cases = {
            "A_benign": a_big.join(a_small, a_big.l_orderkey == a_small.o_orderkey)
            .groupBy().agg(F.sum(F.length(F.col("l_extendedprice").cast("string"))).alias("n")),
            "B_skewed_probe": b_big.join(b_small, "k")
            .groupBy().agg(consume(F.col("pad"), F.col("o_totalprice"))),
            "C_skewed_build": c_probe.join(c_build, "k")
            .groupBy().agg(consume(F.col("pad"), F.col("o_totalprice"))),
        }
        for name, df in cases.items():
            t0 = time.perf_counter()
            n = df.collect()[0][0]
            dt = round(time.perf_counter() - t0, 2)
            rec = joins_in_final_plan(df)
            rec.update({"wall_s": dt, "agg": int(n)})
            with open(f"/tmp/shj_plan_{name}_{conf_on}.txt", "w") as fh:
                fh.write(df._jdf.queryExecution().executedPlan().toString())
            out[f"{name}__{'shj_conf' if conf_on else 'smj_control'}"] = rec
            print(f"# {name} conf_on={conf_on}: {dt}s {rec}", file=sys.stderr)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
