"""TWO-JOB restartable crawl frontier (functions/crawl.py): job 1
computes the fetchable frontier for a link batch against an empty
history, persists the frontier AND the updated fetch history as
BUCKETED stage tables (persist_stage on url); job 2 — a later run
that knows only the table names — feeds a new, overlapping link batch
through the same operator against the persisted history: nothing
already fetched is re-enqueued, robots politeness still applies, the
per-host budget still binds, and A RERUN OF JOB 2 SELECTS THE
IDENTICAL FETCH LIST (hash-ordered budget, no rand()) — the
politeness + dedup + budget pass every crawler runs, restartable by
construction. No reference analog (LLM-pipeline layer)."""

import uuid

from pyspark.sql import functions as F

from malstrom_spark.functions.crawl import crawl_frontier

ROBOTS = {"b.example.com": "User-agent: *\nDisallow: /private/"}


def _links(spark, lo, hi):
    """Candidate links for page ids [lo, hi): two hosts, every 7th
    path under /private/ (disallowed on b.example.com), raw forms
    deliberately unnormalized."""
    ids = spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("h"),
        (F.col("id") % 7 == 0).alias("priv"),
    )
    host = F.when(F.col("h") == "0", F.lit("A.Example.COM")).otherwise(
        F.lit("B.Example.COM")
    )
    return ids.select(
        F.concat(
            F.lit("HTTPS://"), host, F.lit(":443"),
            F.when(F.col("priv"), F.lit("/private/p")).otherwise(F.lit("/p")),
            F.col("id").cast("string"), F.lit("#x"),
        ).alias("url")
    )


def frontier_job(spark, links, history_table, budget=30):
    hist = spark.table(history_table)
    return crawl_frontier(
        links, fetched_history=hist, robots_by_host=ROBOTS,
        user_agent="trainingcrawler", per_host_budget=budget,
    )


def main(spark, tmp_dir=None):
    uid = uuid.uuid4().hex[:8]
    hist_table = f"example_crawl_history_{uid}"
    frontier_table = f"example_crawl_frontier_{uid}"
    from malstrom_spark.operators.bucketing import persist_stage

    try:
        # ---- job 1: first batch against an empty history
        spark.createDataFrame([], "url string").write.saveAsTable(hist_table)
        f1 = frontier_job(spark, _links(spark, 0, 100), hist_table)
        f1 = persist_stage(f1, frontier_table, ["url"], n_buckets=8)
        n1 = f1.count()
        hosts1 = {r["host"] for r in f1.select("host").distinct().collect()}
        assert hosts1 == {"a.example.com", "b.example.com"}, hosts1
        assert not [
            r for r in f1.collect()
            if r["host"] == "b.example.com" and "/private/" in r["url"]
        ], "robots disallow leaked into the frontier"
        per_host = {r["host"]: r["n"] for r in
                    f1.groupBy("host").agg(F.count("*").alias("n")).collect()}
        assert all(v <= 30 for v in per_host.values()), per_host

        # 'fetch' job 1's frontier: append it to the history store
        spark.table(frontier_table).select("url").write.mode("append") \
            .saveAsTable(hist_table)

        # ---- persist job 1's fetches as re-fetchable WARC archives
        # (sources/warc.py warc_sink) — the crawl round-trip's other
        # half: a later pipeline re-reads the same captures with
        # warc_source instead of re-fetching the web
        from malstrom_spark.sources.warc import warc_sink, warc_source

        captures = spark.table(frontier_table).select(
            F.lit("response").alias("warc_type"),
            F.concat(F.lit("<urn:uuid:"), F.md5("url"), F.lit(">"))
            .alias("record_id"),
            F.lit("2026-02-03T04:05:06Z").alias("warc_date"),
            F.col("url").alias("target_uri"),
            F.lit("application/http; msgtype=response").alias("content_type"),
            F.encode(
                F.concat(
                    F.lit("HTTP/1.1 200 OK\r\n\r\n<html><body>"),
                    F.col("url"), F.lit("</body></html>"),
                ),
                "UTF-8",
            ).alias("payload"),
        )
        archive_dir = f"/tmp/malstrom_example_warc_{uid}"
        manifest = warc_sink(captures, archive_dir, n_files=2).collect()
        n_written = sum(r.n_records for r in manifest)
        assert n_written == n1, (n_written, n1)
        reread = warc_source(spark, archive_dir)
        assert {r.target_uri for r in reread.collect()} == {
            r["url"] for r in spark.table(frontier_table).select("url").collect()
        }, "WARC round-trip lost or invented captures"

        # ---- job 2: overlapping batch (ids 50..150) — a later run
        # that knows only the table names
        f2 = frontier_job(spark, _links(spark, 50, 150), hist_table)
        got2 = {r["url"] for r in f2.collect()}
        fetched = {r["url"] for r in spark.table(hist_table).collect()}
        assert not (got2 & fetched), "re-enqueued an already-fetched URL"

        # restartability: the rerun selects the identical fetch list
        rerun = {r["url"] for r in
                 frontier_job(spark, _links(spark, 50, 150), hist_table)
                 .collect()}
        assert rerun == got2

        return {
            "job1_frontier": n1,
            "job2_frontier": len(got2),
            "rerun_identical": True,
            "warc_records": n_written,
        }
    finally:
        import shutil

        spark.sql(f"DROP TABLE IF EXISTS {hist_table}")
        spark.sql(f"DROP TABLE IF EXISTS {frontier_table}")
        shutil.rmtree(f"/tmp/malstrom_example_warc_{uid}", ignore_errors=True)


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session()))
