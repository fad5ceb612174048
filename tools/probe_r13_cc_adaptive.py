"""Interleaved A/B for the ADAPTIVE CC composition (round 13, VERDICT
r12 item #5): alternate dedup._CC_ADAPTIVE_COMPOSE False (round-12
committed shape: one large*+small* round per action) and True (compose
2 rounds per action while the new-edge churn fraction >= threshold,
fall back to 1 near convergence), min of N passes per variant, same
session, adjacent in time. Checks output parity (sorted exact repr) and
reports the per-variant Spark job counts.

Usage:
  python tools/probe_r13_cc_adaptive.py [-n N] [q ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    passes = 2
    if args and args[0] == "-n":
        passes = int(args[1])
        args = args[2:]
    names = args or [
        "customer_entity_groups",
        "dedup_clusters",
        "embedding_semdedup",
        "doc_paragraph_dedup",
    ]

    import malstrom_spark.functions.dedup as dedup_mod
    from malstrom_spark.queries import full_registry
    from malstrom_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        app_name="probe-cc-adaptive", extra_conf={"spark.ui.enabled": "false"}
    )
    sc = spark.sparkContext
    registry = full_registry()

    registry["q1_pricing_summary"].fn(spark, sf_dir).collect()  # warm-up

    def n_jobs() -> int:
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    prof: dict[str, dict] = {}
    parity_rows: dict[str, dict[bool, list]] = {}
    for _pass in range(passes):
        for name in names:
            fn = registry[name].fn
            for adaptive in (False, True):
                dedup_mod._CC_ADAPTIVE_COMPOSE = adaptive
                key = "adaptive" if adaptive else "static1"
                sc.setJobDescription(f"probe-cc {name} {key}")
                j0 = n_jobs()
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                rec = prof.setdefault(name, {"static1": 1e9, "adaptive": 1e9})
                rec[key] = round(min(rec[key], dt), 4)
                rec[f"jobs_{key}"] = n_jobs() - j0
                print(
                    f"# pass{_pass} {name} {key}: {dt:.2f}s "
                    f"jobs={n_jobs() - j0}",
                    file=sys.stderr,
                )
                if _pass == 0:
                    rows = sorted(repr(r) for r in fn(spark, sf_dir).collect())
                    parity_rows.setdefault(name, {})[adaptive] = rows
    for name, by in parity_rows.items():
        ok = by[False] == by[True]
        prof[name]["parity"] = "OK" if ok else "MISMATCH"
        if not ok:
            print(f"# PARITY MISMATCH on {name}", file=sys.stderr)
    dedup_mod._CC_ADAPTIVE_COMPOSE = True
    print(json.dumps(prof))
    spark.stop()


if __name__ == "__main__":
    main()
