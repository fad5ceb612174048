"""A/B probe for individual headline queries (optimization rounds).

Bench-identical methodology (build_session, noop sink, warm-up q1,
min-of-N per query) but UI OFF — the round-12 session measured the
SparkUI listener inflating long-session probes (31 s -> 3 s with UI
off), so probes pin spark.ui.enabled=false explicitly; bench.py's own
session config is unchanged.

Usage: python tools/probe_query.py [-n PASSES] query [query ...]
Prints one JSON line {query: {"total_s": min, "build_s": min,
"write_s": min, "jobs": min}}.
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
    names = args

    from malstrom_spark.queries import full_registry
    from malstrom_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="probe-query")
    sc = spark.sparkContext
    registry = full_registry()

    registry["q1_pricing_summary"].fn(spark, sf_dir).collect()  # warm-up

    def n_jobs() -> int:
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    prof: dict[str, dict] = {}
    for _pass in range(passes):
        for name in names:
            fn = registry[name].fn
            j0 = n_jobs()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j1 = n_jobs()
            rec = prof.setdefault(
                name, {"build_s": 1e9, "write_s": 1e9, "total_s": 1e9, "jobs": 10**9}
            )
            rec["build_s"] = round(min(rec["build_s"], t1 - t0), 4)
            rec["write_s"] = round(min(rec["write_s"], t2 - t1), 4)
            rec["total_s"] = round(min(rec["total_s"], t2 - t0), 4)
            rec["jobs"] = min(rec["jobs"], j1 - j0)
            print(
                f"# pass{_pass} {name}: build {t1-t0:.2f}s write {t2-t1:.2f}s "
                f"jobs {j1-j0}",
                file=sys.stderr,
            )
    print(json.dumps(prof))
    spark.stop()


if __name__ == "__main__":
    main()
