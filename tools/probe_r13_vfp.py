"""VERDICT r12 item #3: reproduce the video_frame_phash bench-context
reading INSIDE a churned session (not an isolated probe), then A/B the
spread() exchange F/T/F/T in that same churned session.

Churn = run a prefix of the headline list once (the rows before
video_frame_phash in bench order — same job/python-worker/GC state the
bench builds up), then alternate spread OFF/ON with interleaved passes.
UI off (probe discipline, round 12). Prints one JSON line.

Usage: python tools/probe_r13_vfp.py [n_churn] [n_reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_churn = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from bench import HEADLINE
    import malstrom_spark.queries as Q
    from malstrom_spark.queries import full_registry
    from malstrom_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        app_name="probe-r13-vfp", extra_conf={"spark.ui.enabled": "false"}
    )
    registry = full_registry()

    # churn: the bench prefix before video_frame_phash, one pass
    idx = HEADLINE.index("video_frame_phash")
    prefix = HEADLINE[max(0, idx - n_churn):idx]
    t0 = time.perf_counter()
    for name in prefix:
        registry[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    churn_s = round(time.perf_counter() - t0, 1)
    print(f"# churn: {len(prefix)} queries in {churn_s}s", file=sys.stderr)

    fn = registry["video_frame_phash"].fn
    res: dict[str, list[float]] = {"spread_off": [], "spread_on": []}
    for rep in range(n_reps):
        for label, maxb in (("spread_off", 0), ("spread_on", 256 << 20)):
            Q._SPREAD_MAX_INPUT_BYTES = maxb
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            res[label].append(dt)
            print(f"# rep{rep} {label}: {dt}s", file=sys.stderr)
    out = {
        "churn_queries": len(prefix),
        "churn_s": churn_s,
        "runs": res,
        "min": {k: min(v) for k, v in res.items()},
        "median": {k: sorted(v)[len(v) // 2] for k, v in res.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
