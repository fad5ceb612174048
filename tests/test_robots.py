"""robots.txt politeness filtering (functions/robots.py, round 9):
RFC 9309 group selection, longest-match rule evaluation, and the
broadcast Column form."""

from pyspark.sql import functions as F

from malstrom_spark.functions.robots import (
    parse_robots,
    robots_allowed,
    robots_allowed_py,
)

ROBOTS = """
# comment line
User-agent: *
Disallow: /private/
Allow: /private/ok.html
Disallow: /*.pdf$

User-agent: SpecialBot
User-agent: OtherBot
Disallow: /

User-agent: trainingcrawler
Allow: /data/
Disallow: /
"""


def test_group_selection_specific_beats_wildcard():
    assert parse_robots(ROBOTS, "TrainingCrawler/1.0") == [
        ("/data/", True), ("/", False)]
    assert parse_robots(ROBOTS, "SpecialBot") == [("/", False)]
    # unknown agent falls back to the * group
    assert parse_robots(ROBOTS, "SomeOther") == [
        ("/private/", False), ("/private/ok.html", True), ("/*.pdf$", False)]


def test_longest_match_and_allow_tiebreak():
    rules = parse_robots(ROBOTS, "nobody")
    assert robots_allowed_py("/public/x.html", rules) is True  # no match
    assert robots_allowed_py("/private/secret.html", rules) is False
    # the longer Allow pattern overrides the /private/ Disallow
    assert robots_allowed_py("/private/ok.html", rules) is True
    # wildcard + $ anchor
    assert robots_allowed_py("/docs/file.pdf", rules) is False
    assert robots_allowed_py("/docs/file.pdfx", rules) is True


def test_empty_disallow_is_allow_all():
    rules = parse_robots("User-agent: *\nDisallow:", "x")
    assert rules == []
    assert robots_allowed_py("/anything", rules) is True


def test_rfc_tie_breaks_to_allow():
    rules = parse_robots(
        "User-agent: *\nAllow: /page\nDisallow: /page", "x")
    assert robots_allowed_py("/page", rules) is True


def test_robots_allowed_column(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.example/private/secret.html"),
            (2, "https://a.example/private/ok.html"),
            (3, "https://a.example/open/x"),
            (4, "https://unlisted.example/anything"),  # no robots: allowed
            (5, None),
        ],
        "id long, url string",
    )
    got = {
        r["id"]: r["ok"]
        for r in df.select(
            "id",
            robots_allowed(
                F.col("url"), {"a.example": ROBOTS}, "anybot"
            ).alias("ok"),
        ).collect()
    }
    assert got == {1: False, 2: True, 3: True, 4: True, 5: None}


def test_robots_allowed_plan_is_single_python_stage(spark):
    """One ArrowEvalPython, zero Exchange — the broadcast-dict shape."""
    df = spark.createDataFrame([(1, "https://a.example/x")],
                               "id long, url string")
    out = df.select(robots_allowed(F.col("url"), {"a.example": ROBOTS}))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1


# --------------------------- round-9 self-review regression pins
def test_other_crawlers_specific_group_cannot_hijack():
    """'googlebot-images' rules must not govern 'googlebot': agent
    tokens match OUR product token, never the reverse (RFC 9309)."""
    content = ("User-agent: googlebot-images\nDisallow: /images/\n\n"
               "User-agent: googlebot\nDisallow: /private/\n")
    assert parse_robots(content, "googlebot") == [("/private/", False)]
    assert parse_robots(content, "googlebot-images") == [("/images/", False)]


def test_rules_before_any_user_agent_are_ignored():
    content = "Disallow: /private/\nUser-agent: goodbot\nAllow: /data/"
    assert parse_robots(content, "goodbot") == [("/data/", True)]


def test_duplicate_groups_for_same_agent_merge():
    """Concatenated robots files repeat groups; RFC 9309 merges groups
    governing the same agent instead of last-one-wins."""
    content = ("User-agent: *\nDisallow: /a/\n\n"
               "User-agent: *\nDisallow: /b/\n")
    rules = parse_robots(content, "anybot")
    assert sorted(rules) == [("/a/", False), ("/b/", False)]
    content2 = ("User-agent: mybot\nDisallow: /a/\n\n"
                "User-agent: mybot\nDisallow: /b/\n")
    assert sorted(parse_robots(content2, "mybot")) == \
        [("/a/", False), ("/b/", False)]


def test_ignored_directive_does_not_split_agent_run():
    """ADVICE r9: an ignored directive (Sitemap, Crawl-delay) between
    consecutive User-agent lines must not terminate the start-of-group
    run — RFC 9309 skips unrecognized lines; only allow/disallow rules
    end the run. Splitting left the first agent allow-all."""
    content = ("User-agent: a\n"
               "Sitemap: http://x.example/sitemap.xml\n"
               "User-agent: b\n"
               "Disallow: /\n")
    assert parse_robots(content, "a") == [("/", False)]
    assert parse_robots(content, "b") == [("/", False)]
    # Crawl-delay inside a rule block still doesn't END the group
    content2 = ("User-agent: c\n"
                "Disallow: /x/\n"
                "Crawl-delay: 10\n"
                "Allow: /x/ok\n")
    assert parse_robots(content2, "c") == [("/x/", False), ("/x/ok", True)]


def test_crawl_delay_group_selection_and_merge():
    from malstrom_spark.functions.robots import crawl_delay

    txt = (
        "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n\n"
        "User-agent: trainingcrawler\nCrawl-delay: 10\nDisallow: /y\n\n"
        "User-agent: trainingcrawler\nCrawl-delay: 7\nDisallow: /z\n"
    )
    # specific groups win over *, merged groups take the MAX delay
    assert crawl_delay(txt, "trainingcrawler") == 10.0
    assert crawl_delay(txt, "otherbot") == 2.0
    # no delay declared anywhere for the governing group
    assert crawl_delay("User-agent: *\nDisallow: /p\n", "x") is None
    assert crawl_delay("", "x") is None


def test_crawl_delay_mid_run_and_bad_values():
    from malstrom_spark.functions.robots import crawl_delay, parse_robots

    # RFC 9309 §2.2.4: a crawl-delay between user-agent lines does NOT
    # interrupt the run — one group governs both agents, delay included
    txt = "User-agent: a\nCrawl-delay: 5\nUser-agent: b\nDisallow: /q\n"
    assert crawl_delay(txt, "a") == 5.0
    assert crawl_delay(txt, "b") == 5.0
    assert parse_robots(txt, "a") == [("/q", False)]
    # unparsable / negative values are ignored; later valid wins
    bad = "User-agent: *\nCrawl-delay: soon\nCrawl-delay: -3\n"
    assert crawl_delay(bad, "x") is None
    two = "User-agent: *\nCrawl-delay: 4\nCrawl-delay: 0.5\n"
    assert crawl_delay(two, "x") == 0.5  # last in-group wins
