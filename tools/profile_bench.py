"""Per-query bench profiler (optimization round instrumentation).

For every headline query, splits the bench's timed region into:
  - build_s: fn(spark, sf_dir) wall — driver-side plan construction,
    including any fits/collects/eager localCheckpoints the query does
  - write_s: the noop-sink write wall — the distributed execution
  - jobs: number of Spark jobs the query submitted (build + write)

Two passes like bench.py (min per phase), JSON to stdout/file.

Usage: python tools/profile_bench.py [out.json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile_bench.json"
    only = sys.argv[2:]

    from bench import HEADLINE
    from malstrom_spark.queries import full_registry
    from malstrom_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="profile-bench")
    sc = spark.sparkContext
    registry = full_registry()
    names = only or HEADLINE

    # warm up
    registry["q1_pricing_summary"].fn(spark, sf_dir).collect()

    def n_jobs() -> int:
        # nextJobId is the count of jobs submitted so far
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    prof: dict[str, dict] = {}
    for _pass in range(2):
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
                name, {"build_s": 1e9, "write_s": 1e9, "total_s": 1e9, "jobs": j1 - j0}
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
    with open(out_path, "w") as f:
        json.dump(prof, f, indent=1)
    tot_b = sum(r["build_s"] for r in prof.values())
    tot_w = sum(r["write_s"] for r in prof.values())
    print(json.dumps({"total_build_s": round(tot_b, 2), "total_write_s": round(tot_w, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
