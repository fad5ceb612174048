"""A/B + output-parity probe for the size-guarded spread() exchange
(round 12). For each query: build+noop-write with spread DISABLED
(threshold forced to 0 -> no-op) and ENABLED, interleaved A/B/A/B in
one session (host-noise discipline), and verify the two variants
return IDENTICAL rows (sorted, exact repr — covers rows-only queries
the DuckDB replica cannot).

Usage: python tools/probe_r12_spread.py [-n PASSES] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm_rows(pdf):
    def cell(v):
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
            return "[" + ",".join(cell(x) for x in v) + "]"
        return repr(v)

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return sorted(
        tuple(cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )


def main():
    args = sys.argv[1:]
    passes = 2
    if args and args[0] == "-n":
        passes = int(args[1])
        args = args[2:]
    names = args

    import malstrom_spark.queries as Q
    from malstrom_spark.queries import full_registry
    from malstrom_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="probe-spread")  # UI off in build_session
    registry = full_registry()

    registry["q1_pricing_summary"].fn(spark, sf_dir).collect()  # warm-up

    def set_spread(on: bool) -> None:
        Q._SPREAD_MAX_INPUT_BYTES = (256 * 1024 * 1024) if on else 0

    prof: dict[str, dict] = {}
    # parity first (cheap at sf0.1? no — use the timed passes' rows at
    # the end instead of separate runs)
    parity: dict[str, bool] = {}
    for name in names:
        fn = registry[name].fn
        set_spread(False)
        off_rows = _norm_rows(fn(spark, sf_dir).toPandas())
        set_spread(True)
        on_rows = _norm_rows(fn(spark, sf_dir).toPandas())
        parity[name] = off_rows == on_rows
        print(f"PARITY {name}: {'OK' if parity[name] else 'MISMATCH'} "
              f"({len(on_rows)} rows)", flush=True)

    for _pass in range(passes):
        for name in names:
            fn = registry[name].fn
            for variant in ("off", "on"):
                set_spread(variant == "on")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                rec = prof.setdefault(name, {"off_s": 1e9, "on_s": 1e9})
                key = f"{variant}_s"
                rec[key] = round(min(rec[key], t2 - t0), 4)
    for name, rec in prof.items():
        rec["parity"] = parity[name]
    print(json.dumps(prof))
    spark.stop()
    sys.exit(0 if all(parity.values()) else 1)


if __name__ == "__main__":
    main()
