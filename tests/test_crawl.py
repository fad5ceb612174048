"""Crawl-frontier operator (functions/crawl.py): normalization,
robots politeness, history dedup, hash-ordered per-host budget."""

import pytest
from pyspark.sql import functions as F

from malstrom_spark.functions.crawl import crawl_frontier

ROBOTS = {"b.example": "User-agent: *\nDisallow: /private/"}


def _links(spark, rows):
    return spark.createDataFrame([(u,) for u in rows], "url string")


def test_frontier_semantics(spark):
    links = _links(spark, [
        "HTTPS://A.Example:443/p1#frag",     # normalizes...
        "https://a.example/p1",              # ...into this duplicate
        "https://a.example/p2",
        "https://b.example/private/x",       # robots-disallowed
        "https://b.example/open",
        "https://a.example/fetched",         # in history
        "not a url",                         # unparseable: dropped
        None,
    ])
    hist = _links(spark, ["https://a.example/fetched"])
    out = crawl_frontier(links, hist, ROBOTS, user_agent="bot")
    got = {(r["url"], r["host"], r["domain"]) for r in out.collect()}
    assert got == {
        ("https://a.example/p1", "a.example", "a.example"),
        ("https://a.example/p2", "a.example", "a.example"),
        ("https://b.example/open", "b.example", "b.example"),
    }, got


def test_frontier_budget_deterministic_and_skew_safe_identical(spark):
    links = _links(spark, [f"https://big.example/p{i}" for i in range(200)]
                   + [f"https://small.example/q{i}" for i in range(3)])
    plain = crawl_frontier(links, per_host_budget=20)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, crawl_frontier(links, per_host_budget=20).collect()))
    assert a == b  # rerun-identical (hash order, no rand)
    skew = crawl_frontier(links, per_host_budget=20, skew_safe=True)
    assert sorted(map(tuple, skew.collect())) == a
    by_host = {r["host"]: r["n"] for r in
               plain.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert by_host == {"big.example": 20, "small.example": 3}
    # portable hash variant is also deterministic (different order OK)
    p1 = sorted(map(tuple,
                    crawl_frontier(links, per_host_budget=20,
                                   portable=True).collect()))
    p2 = sorted(map(tuple,
                    crawl_frontier(links, per_host_budget=20,
                                   portable=True).collect()))
    assert p1 == p2


def test_frontier_no_history_no_robots_no_budget(spark):
    links = _links(spark, ["https://x.example/a", "https://x.example/a",
                           "https://y.example/b"])
    out = crawl_frontier(links)
    assert sorted(r["url"] for r in out.collect()) == \
        ["https://x.example/a", "https://y.example/b"]


def test_frontier_validation(spark):
    with pytest.raises(ValueError, match="per_host_budget"):
        crawl_frontier(_links(spark, ["https://x.example/a"]),
                       per_host_budget=0)


def test_frontier_drops_malformed_authority_urls(spark):
    """Review catch (r10): a malformed authority ('https://h:80x/p')
    can parse a host while url_normalize yields NULL — such rows must
    be dropped, not emitted as NULL fetch targets that dodge the
    history anti-join forever (and the behavior must not depend on
    whether a robots dict is present)."""
    links = _links(spark, ["https://h.example:80x/p",
                           "https://ok.example/p"])
    for robots in (None, ROBOTS):
        out = crawl_frontier(links, robots_by_host=robots).collect()
        assert [r["url"] for r in out] == ["https://ok.example/p"], out
        assert all(r["url"] is not None for r in out)
