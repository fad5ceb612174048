"""Crawl-archive ingestion end to end: WARC/WET segments on disk ->
record parse (corruption quarantined, never fatal) -> WET text
extraction -> URL normalization + registrable-domain keys ->
per-domain cap -> TRAINED quality classifier -> exact dedup by
normalized URL. The front half of a web-scale training-data
pipeline, on the formats crawls actually ship (Common Crawl
.warc.gz / .wet): sources/warc.py + functions/url.py +
functions/text.linear_classifier + one dropDuplicates.

Every step is a zero-shuffle projection except the final URL dedup
(one hash exchange) and the per-domain cap window; at 100 TB the cap
keys are registrable domains (millions of keys, bounded rows each).
No reference analog (LLM-pipeline layer)."""

import gzip
import os

from pyspark.sql import functions as F

from malstrom_spark.functions import url as U
from malstrom_spark.functions.text import linear_classifier
from malstrom_spark.functions.corpus import cap_per_key
from malstrom_spark.functions.html import extract_links, strip_boilerplate_lines
from malstrom_spark.functions.robots import robots_allowed
from malstrom_spark.sources.warc import response_text, warc_source, wet_text


def _record(rec_id, uri, payload: bytes, wtype: str = "conversion") -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        f"WARC-Date: 2026-02-03T04:05:06Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def main(spark, tmp_dir="/tmp/malstrom_example_crawl"):
    import shutil

    shutil.rmtree(tmp_dir, ignore_errors=True)
    seg_dir = os.path.join(tmp_dir, "segments")
    os.makedirs(seg_dir)

    prose = b"the quick brown fox and the lazy dog keep the meadow busy all day"
    spam = b"00 11 22 33 44 55 66 77 88 99 000 111 222 333 444 555"
    # segment 0 (plain): two pages on one host, one URL-duplicate
    # under normalization (default port + fragment), one digit-spam
    seg0 = (
        _record("a1", "https://News.example.COM/world/a", prose)
        + _record("a2", "https://news.example.com:443/world/a#top", prose)
        + _record("a3", "http://news.example.com/spam", spam)
    )
    with open(os.path.join(seg_dir, "seg0.warc"), "wb") as f:
        f.write(seg0)
    # segment 1 (member-gzip): a co.uk host with three deep pages (cap
    # will keep 2) and a truncated tail record (quarantined)
    seg1 = b"".join(
        gzip.compress(
            _record(f"b{i}", f"https://blog.paper.co.uk/p/{i}", prose + bytes([48 + i]))
        )
        for i in range(3)
    ) + gzip.compress(b"WARC/1.0\r\nContent-Length: 999\r\n\r\nxx")
    with open(os.path.join(seg_dir, "seg1.warc.gz"), "wb") as f:
        f.write(seg1)

    # segment 2: WARC *response* records — the raw-HTTP form crawls
    # actually capture — carrying HTML bodies (round 9: the pipeline
    # now starts at raw HTML, not WET pre-extracted text)
    page = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        b"<html><head><title>Fox news</title><style>h1{x}</style></head>"
        b"<body><h1>the quick brown fox</h1><script>nav()</script>"
        b"<p>and the lazy dog keep the meadow busy</p>"
        b'<p><a href="/about">About us</a> and '
        b'<a href="https://blog.paper.co.uk/p/0">a friend</a> but not '
        b'<a href="javascript:x()">this</a></p>'
        b"<p>Cookie policy &amp; terms of use</p></body></html>"
    )
    seg2 = _record("c1", "https://html.example.org/fox", page, wtype="response")
    with open(os.path.join(seg_dir, "seg2.warc"), "wb") as f:
        f.write(seg2)

    records = warc_source(spark, seg_dir)
    n_err = records.where(F.col("warc_type") == "parse_error").count()
    assert n_err == 1, n_err  # the truncated tail, quarantined not fatal

    # raw-HTML path: HTTP headers stripped, markup parsed, boilerplate
    # line dropped by the Column-level filter
    pages = response_text(records).withColumn(
        "clean", strip_boilerplate_lines(F.col("text"), min_words=2)
    )
    [page_row] = pages.collect()
    assert page_row["text"] == (
        "Fox news\nthe quick brown fox\n"
        "and the lazy dog keep the meadow busy\n"
        "About us and a friend but not this\n"
        "Cookie policy & terms of use"
    ), page_row["text"]
    assert page_row["clean"] == (
        "Fox news\nthe quick brown fox\nand the lazy dog keep the meadow busy\n"
        "About us and a friend but not this"
    ), page_row["clean"]

    # link graph: anchors -> RFC-3986-resolved edges keyed by host —
    # the crawl-frontier / PageRank feed (javascript: href dropped)
    links = pages.select(
        U.url_host(F.col("target_uri")).alias("src_host"),
        F.explode(extract_links(F.col("html"), F.col("target_uri"))).alias("l"),
    ).select(
        "src_host",
        U.url_host(F.col("l.href")).alias("dst_host"),
        F.col("l.href").alias("href"),
    )
    edge_set = {(r["src_host"], r["dst_host"]) for r in links.collect()}
    assert edge_set == {
        ("html.example.org", "html.example.org"),   # /about resolved on-host
        ("html.example.org", "blog.paper.co.uk"),
    }, edge_set

    # crawl frontier politeness: the friend's robots.txt disallows /p/
    # for everyone — its deep link drops out of the fetchable frontier
    frontier = links.withColumn(
        "fetchable",
        robots_allowed(
            F.col("href"),
            {"blog.paper.co.uk": "User-agent: *\nDisallow: /p/"},
            "trainingcrawler",
        ),
    )
    fetchable = {r["href"] for r in frontier.where("fetchable").collect()}
    assert fetchable == {"https://html.example.org/about"}, fetchable

    # sitemap discovery: the same robots.txt declares the host's
    # sitemap; its (gzipped) urlset explodes into frontier candidates,
    # and a cross-host injected loc is dropped by the protocol's
    # cross-submission rule — links found by crawling and URLs
    # declared by the site enter one frontier
    from malstrom_spark.functions.sitemap import (
        robots_sitemap_urls,
        sitemap_entries,
    )

    friend_robots = (
        "User-agent: *\nDisallow: /p/\n"
        "Sitemap: https://blog.paper.co.uk/sitemap.xml.gz\n"
    )
    sm_urls = robots_sitemap_urls(friend_robots)
    assert sm_urls == ["https://blog.paper.co.uk/sitemap.xml.gz"]
    sitemap_xml = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://blog.paper.co.uk/archive</loc>"
        "<lastmod>2026-03-01</lastmod></url>"
        "<url><loc>https://blog.paper.co.uk/feed</loc></url>"
        "<url><loc>https://evil.example/injected</loc></url>"
        "</urlset>"
    ).encode()
    sm_df = spark.createDataFrame(
        [(sm_urls[0], gzip.compress(sitemap_xml))],
        "sitemap_url string, payload binary",
    )
    discovered = {
        r.loc
        for r in sitemap_entries(
            sm_df, "payload", sitemap_url_col="sitemap_url"
        ).collect()
    }
    assert discovered == {
        "https://blog.paper.co.uk/archive",
        "https://blog.paper.co.uk/feed",
    }, discovered

    docs = wet_text(records).select(
        "record_id",
        "text",
        U.url_normalize(F.col("target_uri")).alias("url"),
    )
    docs = docs.withColumn("domain", U.registrable_domain(U.url_host(F.col("url"))))

    # URL-level exact dedup: a2 collapses into a1 (same normalized URL)
    deduped = docs.dropDuplicates(["url"])
    assert deduped.count() == 5  # 6 good records - 1 URL duplicate

    # per-domain cap: keep 2 per registrable domain, deterministic order
    capped = cap_per_key(deduped, ["domain"], 2, [F.col("url")])
    by_domain = {
        r.domain: r.n
        for r in capped.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert by_domain == {"example.com": 2, "paper.co.uk": 2}

    # trained quality gate: prose passes, digit-spam fails
    scored = linear_classifier(
        capped,
        "url",
        weights={"alpha_ratio": 2.0, "digit_ratio": -4.0, "stopword_ratio": 3.0},
        bias=-1.0,
    )
    kept = {r.url for r in scored.where("keep").collect()}
    assert "http://news.example.com/spam" not in kept
    assert "https://news.example.com/world/a" in kept

    return {
        "records": 8,
        "html_pages": 1,
        "quarantined": n_err,
        "sitemap_discovered": len(discovered),
        "after_url_dedup": 5,
        "after_domain_cap": 4,
        "kept_by_classifier": len(kept),
    }
