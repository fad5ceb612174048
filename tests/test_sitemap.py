"""Sitemap parsing (functions/sitemap.py): the five payload shapes
(urlset / sitemapindex / plain text, each optionally gzipped), the
protocol's own caps as adversarial-input bounds, the cross-submission
host rule, and the quarantine contract on the Spark explode."""

import gzip

import pytest

from malstrom_spark.functions import sitemap as sm

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(urls, ns=NS):
    items = "".join(
        "<url><loc>%s</loc>%s%s%s</url>"
        % (
            u,
            f"<lastmod>{m}</lastmod>" if m else "",
            f"<changefreq>{c}</changefreq>" if c else "",
            f"<priority>{p}</priority>" if p is not None else "",
        )
        for u, m, c, p in urls
    )
    return f'<?xml version="1.0" encoding="UTF-8"?><urlset {ns}>{items}</urlset>'.encode()


def test_robots_sitemap_urls():
    txt = (
        "User-agent: *\nDisallow: /private/\n"
        "sitemap: https://a.example/sitemap.xml\n"
        "SITEMAP: https://a.example/news.xml  # comment\n"
        "Sitemap: https://a.example/sitemap.xml\n"  # dup dropped
        "Sitemap: /relative/not-allowed.xml\n"
        "Sitemap: ftp://a.example/nope.xml\n"
    )
    assert sm.robots_sitemap_urls(txt) == [
        "https://a.example/sitemap.xml",
        "https://a.example/news.xml",
    ]


def test_parse_urlset_fields_and_bad_values():
    kind, entries = sm.parse_sitemap_bytes(
        _urlset(
            [
                ("https://a.example/p1", "2026-01-02", "daily", 0.8),
                ("https://a.example/p2", None, None, None),
                ("https://a.example/p3", "2026-03-04T05:06:07+00:00", "WEEKLY", "high"),
                ("javascript:alert(1)", None, None, 0.5),  # dropped loc
                ("", None, None, None),  # dropped loc
            ]
        )
    )
    assert kind == "urlset"
    assert entries == [
        ("https://a.example/p1", "2026-01-02", "daily", 0.8),
        ("https://a.example/p2", None, None, None),
        # invalid priority -> None, changefreq lowercased
        ("https://a.example/p3", "2026-03-04T05:06:07+00:00", "weekly", None),
    ]


def test_parse_sitemapindex_and_gzip():
    xml = (
        f'<sitemapindex {NS}>'
        "<sitemap><loc>https://a.example/s1.xml.gz</loc>"
        "<lastmod>2026-02-01</lastmod></sitemap>"
        "<sitemap><loc>https://a.example/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    ).encode()
    want = [
        ("https://a.example/s1.xml.gz", "2026-02-01", None, None),
        ("https://a.example/s2.xml", None, None, None),
    ]
    assert sm.parse_sitemap_bytes(xml) == ("index", want)
    assert sm.parse_sitemap_bytes(gzip.compress(xml)) == ("index", want)


def test_parse_plain_text_form():
    body = b"https://a.example/p1\n\n  https://a.example/p2  \nnot-a-url\n"
    kind, entries = sm.parse_sitemap_bytes(body)
    assert kind == "text"
    assert [e[0] for e in entries] == [
        "https://a.example/p1", "https://a.example/p2",
    ]
    assert all(e[1:] == (None, None, None) for e in entries)


def test_parse_rejects_garbage_and_wrong_roots():
    for bad in (b"", b"<html><body>hi</body></html>",
                b"<urlset><url><loc>https://x/", b"\x00\x01\x02"):
        with pytest.raises(ValueError):
            sm.parse_sitemap_bytes(bad)


def test_caps_are_enforced():
    # entry cap truncates (the spec forbids more; no further expansion)
    many = _urlset(
        [(f"https://a.example/p{i}", None, None, None) for i in range(30)]
    )
    _, entries = sm.parse_sitemap_bytes(many, max_entries=10)
    assert len(entries) == 10
    # gzip bomb: 200 MB of zeros compresses tiny, must raise not OOM
    bomb = gzip.compress(b"\x00" * (sm.SITEMAP_MAX_BYTES + 1))
    with pytest.raises(ValueError, match="50 MB"):
        sm.parse_sitemap_bytes(bomb)


def test_sitemap_entries_explode_quarantine_and_host_rule(spark):
    rows = [
        (
            1,
            "https://a.example/sitemap.xml",
            _urlset(
                [
                    ("https://a.example/p1", "2026-01-02", "daily", 0.5),
                    ("https://evil.example/inject", None, None, None),
                ]
            ),
        ),
        (2, "https://b.example/sitemap.xml", b"not xml at all <"),
        (
            3,
            "https://c.example/sm.txt",
            gzip.compress(b"https://c.example/x\nhttps://c.example/y\n"),
        ),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, sitemap_url string, payload binary"
    )
    out = sm.sitemap_entries(
        df, "payload", sitemap_url_col="sitemap_url"
    ).collect()
    got = sorted((r.doc_id, r.kind, r.loc, r.lastmod, r.changefreq,
                  r.priority) for r in out)
    # doc 1: cross-host loc dropped; doc 2: quarantined (zero rows);
    # doc 3: gzipped plain-text form
    assert got == [
        (1, "urlset", "https://a.example/p1", "2026-01-02", "daily", 0.5),
        (3, "text", "https://c.example/x", None, None, None),
        (3, "text", "https://c.example/y", None, None, None),
    ]
    # enforce_host off: the cross-host loc comes back
    loose = sm.sitemap_entries(df, "payload", enforce_host=False).collect()
    assert sum(1 for r in loose if r.loc == "https://evil.example/inject") == 1


def test_sitemap_entries_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [(1, _urlset([("https://a.example/p", None, None, None)]))],
        "doc_id long, payload binary",
    )
    plan = sm.sitemap_entries(df, "payload")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_hostile_inputs_never_crash(spark):
    """Adversarial-input hardening: truncated gzip quarantines (no
    partial corrupt URLs), hostile authorities in Sitemap: lines and
    sitemap_url values are skipped/quarantined, never raised."""
    import gzip as _gz

    # truncated gzip -> ValueError (quarantine), not partial output
    full = _gz.compress(b"https://a.example/page-1234\n")
    with pytest.raises(ValueError, match="truncated"):
        sm.parse_sitemap_bytes(full[:-5])
    # hostile Sitemap: line in robots.txt is skipped, rest collected
    assert sm.robots_sitemap_urls(
        "Sitemap: https://[x\nSitemap: https://a.example/s.xml\n"
    ) == ["https://a.example/s.xml"]
    # hostile loc inside a urlset is dropped, good locs kept
    body = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://[bad</loc></url>"
        "<url><loc>https://a.example/ok</loc></url></urlset>"
    ).encode()
    assert sm.parse_sitemap_bytes(body)[1] == [
        ("https://a.example/ok", None, None, None)]
    # hostile sitemap_url value quarantines the ROW on the Spark path
    df = spark.createDataFrame(
        [(1, "https://[bad.example/sm.xml", body),
         (2, "https://a.example/sm.xml", body)],
        "doc_id long, sitemap_url string, payload binary",
    )
    rows = sm.sitemap_entries(
        df, "payload", sitemap_url_col="sitemap_url"
    ).collect()
    assert [(r.doc_id, r.loc) for r in rows] == [
        (2, "https://a.example/ok")]


def test_gunzip_multi_member_sitemap():
    """Concatenated (multi-member) gzip is valid RFC 1952 output from
    rotating sitemap writers: all members must decompress, not just
    the first (round-11 ADVICE fix); the cumulative cap still holds
    and a corrupt tail still quarantines."""
    import gzip
    import pytest
    from malstrom_spark.functions.sitemap import _gunzip_bounded

    a = gzip.compress(b"<urlset>part-one")
    b = gzip.compress(b"...part-two</urlset>")
    assert _gunzip_bounded(a + b, 1 << 20) == \
        b"<urlset>part-one...part-two</urlset>"
    # trailing NUL block padding after the last member is tolerated
    assert _gunzip_bounded(a + b + b"\x00" * 512, 1 << 20).endswith(
        b"</urlset>")
    # cumulative cap applies across members
    with pytest.raises(ValueError, match="50 MB|cap"):
        _gunzip_bounded(a + b, 20)
    # corrupt second member quarantines loudly, never truncates
    with pytest.raises(ValueError):
        _gunzip_bounded(a + b"not gzip at all", 1 << 20)
    # truncated second member quarantines too
    with pytest.raises(ValueError, match="truncated"):
        _gunzip_bounded(a + b[: len(b) // 2], 1 << 20)
