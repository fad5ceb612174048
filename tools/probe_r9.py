"""sf0.1 -> sf10 (100x) scale probes for the round-9 operators
(BASELINE.md round-9 table). Methodology as prior rounds: honest
keyed replica (tools/make_sf_replica.py), warm min-of-2, solo.

The HTML rows construct their markup from per-doc columns and run the
REAL stdlib parser over every document — the probe measures the
Python-parser hop (the one non-codegen stage in the crawl path) at
100x document count; expected shape is linear in bytes at scan
parallelism (zero shuffles in all three rows).

Usage: python tools/probe_r9.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from malstrom_spark.session import build_session  # noqa: E402
from malstrom_spark.queries import full_registry  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF10 = "/tmp/testdata/sf10"

NAMES = [
    "doc_html_extract",
    "doc_html_links",
    "doc_html_meta",
    "doc_html_main_text",
    "customer_pagerank_dangling",
    "doc_bm25_incremental",
    "customer_triangles",
]


def main():
    only = set(sys.argv[1:])
    spark = build_session(app_name="probe-r9")
    fr = full_registry()
    for name in NAMES:
        if only and name not in only:
            continue
        line = [name]
        for sf_dir in (SF01, SF10):
            times = []
            for _ in range(2):
                t0 = time.time()
                # noop write, NOT count(): the HTML rows are pure
                # projections and count() would prune the pandas_udf
                # columns away — the write materializes every cell
                fr[name].fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                times.append(time.time() - t0)
            line.append(f"{sf_dir.split('/')[-1]}: {min(times):.2f}s")
        print(" | ".join(line), flush=True)


if __name__ == "__main__":
    main()
