"""Interleaved A/B for the CC rounds-per-action experiment (round 12):
run the CC-dependent queries alternating dedup._CC_ROUNDS_PER_ACTION
between 1 (one large*+small* round per driver action — the committed
shape) and 2 (two composed rounds per action — halves driver actions
at the cost of at most one wasted round past the fixpoint), min of N
passes per variant, same session and adjacent in time (host-noise
discipline). Also checks output parity between the variants (sorted
exact repr) — the fixpoint is provably identical, the check proves it.

Usage:
  python tools/probe_r12_cc.py [-n N] q [q ...]
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
    names = args or ["customer_entity_groups", "dedup_clusters", "embedding_semdedup"]

    import malstrom_spark.functions.dedup as dedup_mod
    from malstrom_spark.queries import full_registry
    from malstrom_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="probe-cc")
    registry = full_registry()

    registry["q1_pricing_summary"].fn(spark, sf_dir).collect()  # warm-up

    prof: dict[str, dict] = {}
    parity_rows: dict[str, dict[int, list]] = {}
    for _pass in range(passes):
        for name in names:
            fn = registry[name].fn
            for steps in (1, 2):
                dedup_mod._CC_ROUNDS_PER_ACTION = steps
                spark.sparkContext.setJobDescription(f"probe-cc {name} steps={steps}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                rec = prof.setdefault(name, {"s1": 1e9, "s2": 1e9})
                rec[f"s{steps}"] = round(min(rec[f"s{steps}"], dt), 4)
                print(f"# pass{_pass} {name} steps={steps}: {dt:.2f}s",
                      file=sys.stderr)
                if _pass == 0:
                    rows = sorted(repr(r) for r in fn(spark, sf_dir).collect())
                    parity_rows.setdefault(name, {})[steps] = rows
    for name, by_steps in parity_rows.items():
        ok = by_steps[1] == by_steps[2]
        prof[name]["parity"] = "OK" if ok else "MISMATCH"
        if not ok:
            print(f"# PARITY MISMATCH on {name}", file=sys.stderr)
    dedup_mod._CC_ROUNDS_PER_ACTION = 1
    print(json.dumps(prof))
    spark.stop()


if __name__ == "__main__":
    main()
