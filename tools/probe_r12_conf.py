"""Interleaved A/B for RUNTIME-settable SQL confs (round 12, session
2): per pass, each query runs once with the conf set OFF and once ON
(same session, adjacent in time — the host-noise discipline), min of
N passes per variant. Output parity is NOT checked here (conf changes
cannot change results; the oracle replica covers that).

Usage:
  python tools/probe_r12_conf.py -c key=val[,key=val...] [-n N] q [q ...]
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
    confs: list[tuple[str, str]] = []
    while args and args[0] in ("-n", "-c"):
        if args[0] == "-n":
            passes = int(args[1])
        else:
            confs = [tuple(kv.split("=", 1)) for kv in args[1].split(",")]
        args = args[2:]
    names = args
    assert confs, "need -c key=val"

    from malstrom_spark.queries import full_registry
    from malstrom_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="probe-conf")
    registry = full_registry()
    baseline = {k: spark.conf.get(k, None) for k, _ in confs}

    def set_variant(on: bool) -> None:
        for k, v in confs:
            if on:
                spark.conf.set(k, v)
            elif baseline[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, baseline[k])

    registry["q1_pricing_summary"].fn(spark, sf_dir).collect()  # warm-up

    prof: dict[str, dict] = {}
    for _pass in range(passes):
        for name in names:
            fn = registry[name].fn
            for variant in ("off", "on"):
                set_variant(variant == "on")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                rec = prof.setdefault(name, {"off_s": 1e9, "on_s": 1e9})
                rec[f"{variant}_s"] = round(min(rec[f"{variant}_s"], dt), 4)
                print(f"# pass{_pass} {name} {variant}: {dt:.2f}s",
                      file=sys.stderr)
    set_variant(False)
    print(json.dumps(prof))
    spark.stop()


if __name__ == "__main__":
    main()
