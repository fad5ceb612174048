"""URL function library: extraction, normalization, eTLD+1."""

from pyspark.sql import functions as F

from malstrom_spark.functions import url as U


def _one(spark, s, col):
    df = spark.createDataFrame([(s,)], "url string")
    return df.select(col(F.col("url")).alias("v")).collect()[0].v


def test_components(spark):
    u = "HTTPS://User:pw@WWW.Example.CO.UK:8443/a/b/c?x=1&y=2#frag"
    assert _one(spark, u, U.url_scheme) == "https"
    assert _one(spark, u, U.url_host) == "www.example.co.uk"
    assert _one(spark, u, U.url_port) == 8443
    assert _one(spark, u, U.url_path) == "/a/b/c"
    assert _one(spark, u, U.url_path_depth) == 3
    assert (
        _one(spark, u, U.url_normalize)
        == "https://www.example.co.uk:8443/a/b/c?x=1&y=2"
    )


def test_normalize_default_ports_and_empty_path(spark):
    assert _one(spark, "https://A.com:443#f", U.url_normalize) == "https://a.com/"
    assert _one(spark, "http://a.com:80/x", U.url_normalize) == "http://a.com/x"
    # 443 on http is NOT a default port -> kept
    assert _one(spark, "http://a.com:443/", U.url_normalize) == "http://a.com:443/"
    assert _one(spark, "not a url", U.url_normalize) is None
    assert _one(spark, "https://b.org", U.url_path) == "/"
    assert _one(spark, "https://b.org", U.url_path_depth) == 0


def test_registrable_domain(spark):
    cases = {
        "www.example.co.uk": "example.co.uk",
        "a.b.news.com.au": "news.com.au",
        "deep.sub.example.com": "example.com",
        "example.com": "example.com",
        "co.uk": "co.uk",
        "localhost": "localhost",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r.host: r.d
        for r in df.select(
            "host", U.registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    assert got == cases


def test_projections_are_shuffle_free(spark):
    df = spark.createDataFrame([("https://a.com/x",)] * 3, "url string")
    plan = (
        df.select(
            U.url_normalize(F.col("url")),
            U.registrable_domain(U.url_host(F.col("url"))),
            U.url_path_depth(F.col("url")),
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_fragment_question_mark_is_not_a_query(spark):
    """A '?' inside the fragment must not resurrect as a query —
    otherwise two URLs equal up to fragment normalize to different
    dedup keys."""
    assert (
        _one(spark, "https://ex.com/page#sec?x=1", U.url_normalize)
        == "https://ex.com/page"
    )
    assert (
        _one(spark, "https://ex.com/page?a=1#sec?x=2", U.url_normalize)
        == "https://ex.com/page?a=1"
    )


def test_malformed_authority_normalizes_to_null(spark):
    """ADVICE r7: 'http://h:80x/p' used to partial-match port=80 and
    normalize to a cleaned-looking URL, letting junk collide with
    valid URLs during dedup. Malformed authorities must NULL."""
    for bad in (
        "http://h:80x/p",          # junk after port digits
        "http://h:80:90/p",        # two colons
        "http://[::1]:8080/x",     # IPv6 bracket host (out of scope)
        "http://h:/p",             # colon with no digits
    ):
        assert _one(spark, bad, U.url_normalize) is None, bad
    # and port extraction itself no longer partial-matches
    assert _one(spark, "http://h:80x/p", U.url_port) is None
    # well-formed ports at every terminator still work
    assert _one(spark, "http://h:81", U.url_port) == 81
    assert _one(spark, "http://h:81?q=1", U.url_port) == 81
    assert _one(spark, "http://h:81#f", U.url_port) == 81


def test_registrable_domain_psl_full_semantics(spark):
    """Full PSL algorithm: exact multi-level rules, wildcard,
    exception, private-section entries, implicit * default, and
    NULL for unregistrable hosts."""
    cases = {
        "www.example.co.uk": "example.co.uk",
        "a.b.news.com.tr": "news.com.tr",
        "shop.example.co.nz": "example.co.nz",
        "deep.sub.example.com": "example.com",
        "example.com": "example.com",
        "co.uk": None,          # a public suffix is not registrable
        "com": None,
        "localhost": None,      # implicit * rule
        "foo.ck": None,         # *.ck makes foo.ck a public suffix
        "bar.foo.ck": "bar.foo.ck",
        "www.ck": "www.ck",     # !www.ck exception
        "sub.www.ck": "www.ck",
        "x.y.kawasaki.jp": "x.y.kawasaki.jp",   # 3-level wildcard
        "city.kawasaki.jp": "city.kawasaki.jp",  # 3-level exception
        "a.city.kawasaki.jp": "city.kawasaki.jp",
        "user.github.io": "user.github.io",      # private section
        "github.io": None,
        "x.b.blogspot.com": "b.blogspot.com",
        "": None,
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r.host: r.d
        for r in df.select(
            "host", U.registrable_domain_psl(F.col("host")).alias("d")
        ).collect()
    }
    assert got == cases


def test_parse_psl_file_format(spark):
    text = """
// ===BEGIN ICANN DOMAINS===
com
  co.uk
*.ck
!www.ck

// comment
"""
    rules = U.parse_psl(text)
    assert rules == ["com", "co.uk", "*.ck", "!www.ck"]
    df = spark.createDataFrame([("a.b.co.uk",), ("x.ck",)], "host string")
    got = [
        r.d
        for r in df.select(
            U.registrable_domain_psl(F.col("host"), rules).alias("d")
        ).collect()
    ]
    assert got == ["b.co.uk", None]


def test_psl_lookup_is_shuffle_free(spark):
    df = spark.createDataFrame([("a.co.uk",)] * 3, "host string")
    plan = (
        df.select(U.registrable_domain_psl(F.col("host")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
