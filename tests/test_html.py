"""Raw-HTML -> text extraction (functions/html.py, round 9): the
pure-Python kernel's semantics, the Column wrappers, the boilerplate
line filter, and the WARC response-record path."""

import pytest

from malstrom_spark.functions.html import (
    html_to_text,
    html_to_text_py,
    strip_boilerplate_lines,
)

from pyspark.sql import functions as F


# ------------------------------------------------- pure-Python kernel
def test_block_tags_break_lines_inline_tags_dont():
    assert html_to_text_py(
        "<h1>Title</h1><p>one <b>bold</b> and <a href='x'>link</a></p>"
        "<div>block</div>"
    ) == "Title\none bold and link\nblock"


def test_script_style_comment_noscript_dropped():
    assert html_to_text_py(
        "<style>p{}</style><script>if(a<b){document.write('<p>x</p>')}"
        "</script><!-- gone --><noscript>enable js</noscript>keep"
    ) == "keep"


def test_script_cdata_fake_tags_inside_string_do_not_terminate():
    # "</p>" inside a script string must not leak text or break lines
    assert html_to_text_py(
        '<p>a</p><script>var x = "</p>leak<p>";</script><p>b</p>'
    ) == "a\nb"


def test_nested_skip_subtree_markup_suppressed():
    # noscript children are parsed as markup — their block tags must
    # not emit line breaks while suppressed
    assert html_to_text_py(
        "<noscript><div>hidden</div><p>also hidden</p></noscript>shown"
    ) == "shown"


def test_entities_decode_exactly_once():
    assert html_to_text_py("&quot;q&quot; &#97;nd &amp;amp;") == '"q" and &amp;'


def test_raw_newlines_are_spaces_not_line_breaks():
    assert html_to_text_py("<p>wrapped\nacross\n\tlines</p>") == (
        "wrapped across lines"
    )


def test_whitespace_collapse_and_empty_line_drop():
    assert html_to_text_py(
        "<div>  </div><p>  a   b  </p><p></p><p>c</p>"
    ) == "a b\nc"


def test_malformed_html_never_raises():
    # unclosed, stray closers, uppercase, bare attrs, tag soup
    assert html_to_text_py(
        "<P CLASS=X>unclosed <b>bold</i> text<p>more"
    ) == "unclosed bold text\nmore"
    assert html_to_text_py("</div>stray<br x>") == "stray"
    # a tag truncated AT EOF surfaces as data (stdlib lenient mode) —
    # the contract is "never raises", not "repairs the capture"
    assert html_to_text_py("<br x").strip() != "" or True
    assert html_to_text_py("") == ""


def test_br_and_title_break_lines():
    assert html_to_text_py(
        "<head><title>T</title></head>a<br/>b<br>c"
    ) == "T\na\nb\nc"


# ------------------------------------------------------ Column forms
def test_html_to_text_column_null_safe(spark):
    df = spark.createDataFrame(
        [(1, "<p>x</p><p>y</p>"), (2, None)], "id long, html string"
    )
    got = {r["id"]: r["t"] for r in df.select(
        "id", html_to_text(F.col("html")).alias("t")).collect()}
    assert got == {1: "x\ny", 2: None}


def test_strip_boilerplate_lines_is_pure_column(spark):
    df = spark.createDataFrame(
        [(1, "real content line\nCookie Policy\nok\nAll Rights Reserved.\n"
             "short")],
        "id long, text string",
    )
    out = df.select(strip_boilerplate_lines(
        F.col("text"), min_words=2).alias("t"))
    assert out.collect()[0]["t"] == "real content line"
    # zero Python, zero shuffle: no Exchange, no Python eval in plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


# -------------------------------------------- WARC response records
def test_response_text_strips_http_headers(spark, tmp_path):
    from malstrom_spark.sources.warc import response_text, warc_source

    body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b"<h1>Hello</h1><p>crawl &amp; parse</p>")
    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Record-ID: <urn:uuid:r1>\r\n"
           b"WARC-Target-URI: https://a.example/x\r\n"
           b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
           + body + b"\r\n\r\n")
    # a headerless (truncated-capture) record: treated as all-body
    body2 = b"<p>no http header</p>"
    raw += (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:r2>\r\n"
            b"WARC-Target-URI: https://a.example/y\r\n"
            b"Content-Length: " + str(len(body2)).encode() + b"\r\n\r\n"
            + body2 + b"\r\n\r\n")
    p = tmp_path / "seg.warc"
    p.write_bytes(raw)
    out = response_text(warc_source(spark, str(tmp_path)))
    got = {r["record_id"]: (r["html"], r["text"]) for r in out.collect()}
    assert got["<urn:uuid:r1>"][0] == "<h1>Hello</h1><p>crawl &amp; parse</p>"
    assert got["<urn:uuid:r1>"][1] == "Hello\ncrawl & parse"
    assert got["<urn:uuid:r2>"][1] == "no http header"


def test_response_text_ignores_conversion_records(spark, tmp_path):
    from malstrom_spark.sources.warc import response_text, warc_source

    body = b"plain wet text"
    raw = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
           b"WARC-Record-ID: <urn:uuid:w1>\r\n"
           b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
           + body + b"\r\n\r\n")
    (tmp_path / "seg.warc").write_bytes(raw)
    assert response_text(warc_source(spark, str(tmp_path))).count() == 0


# ------------------------------------------------- link extraction
def test_extract_links_resolution_and_filtering():
    from malstrom_spark.functions.html import extract_links_py

    html = (
        '<a href="/root.html">Root <b>link</b></a>'
        '<a href="rel/child.html">child</a>'
        '<a href="https://other.org/x?q=1">abs</a>'
        '<a href="//cdn.net/l.js">pr</a>'
        '<a href="javascript:void(0)">no</a>'
        '<a href="mailto:a@b.c">no</a>'
        '<a href="#frag">no</a>'
        '<a href="p2.html#sec">fs</a>'
    )
    base = "https://s.example.com/a/b/page.html"
    assert extract_links_py(html, base) == [
        ("https://s.example.com/root.html", "Root link"),
        ("https://s.example.com/a/b/rel/child.html", "child"),
        ("https://other.org/x?q=1", "abs"),
        ("https://cdn.net/l.js", "pr"),
        ("https://s.example.com/a/b/p2.html", "fs"),
    ]
    # no base: only absolute links survive
    assert extract_links_py(html) == [("https://other.org/x?q=1", "abs")]


def test_extract_links_lenient_nesting_and_eof():
    from malstrom_spark.functions.html import extract_links_py

    # nested <a> finalizes the previous; open <a> at EOF finalized
    html = '<a href="https://a.example/1">one <a href="https://a.example/2">two'
    assert extract_links_py(html) == [
        ("https://a.example/1", "one"),
        ("https://a.example/2", "two"),
    ]
    # href-less anchor contributes nothing
    assert extract_links_py("<a>plain</a>") == []


def test_extract_links_column_null_safe(spark):
    from malstrom_spark.functions.html import extract_links

    df = spark.createDataFrame(
        [(1, '<a href="/x">t</a>', "https://h.example/b/"), (2, None, None)],
        "id long, html string, base string",
    )
    out = df.select(
        "id", extract_links(F.col("html"), F.col("base")).alias("l")
    ).collect()
    got = {r["id"]: r["l"] for r in out}
    assert [tuple(x) for x in got[1]] == [("https://h.example/x", "t")]
    assert got[2] is None


def test_html_meta_fields_and_nulls(spark):
    from malstrom_spark.functions.html import html_meta, html_meta_py

    assert html_meta_py(
        '<html lang="fr"><head><title> A  &amp; B </title>'
        '<meta name="Description" content=" d "></head></html>'
    ) == ("A & B", "d", "fr")
    assert html_meta_py("<p>no head</p>") == (None, None, None)

    df = spark.createDataFrame(
        [(1, "<title>t</title>")], "id long, html string")
    row = df.select(html_meta(F.col("html")).alias("m")).collect()[0]["m"]
    assert (row["title"], row["description"], row["lang"]) == ("t", None, None)


# ------------------------------------------ main-content extraction
def test_html_blocks_features():
    from malstrom_spark.functions.html import html_blocks_py

    html = ('<div><a href="/a">Home</a> <a href="/b">News</a></div>'
            "<p>plain prose block here</p>"
            '<p>with <a href="/x">one link</a> inside prose</p>')
    assert html_blocks_py(html) == [
        ("Home News", 2, 2),
        ("plain prose block here", 4, 0),
        ("with one link inside prose", 5, 2),
    ]


def test_main_content_drops_high_link_density_blocks(spark):
    from malstrom_spark.functions.html import main_content_text

    html = ('<div><a href="/h">Home</a> <a href="/n">News</a> '
            '<a href="/s">Sports</a></div>'
            "<h1>Article title here</h1>"
            "<p>the real body of the article with plain words</p>"
            '<div><a href="/p">Prev</a> | <a href="/n2">Next</a></div>'
            "<p>ok</p>")  # 1 word: dropped by min_words
    df = spark.createDataFrame([(1, html)], "id long, html string")
    got = df.select(main_content_text(F.col("html")).alias("t")) \
        .collect()[0]["t"]
    assert got == ("Article title here\n"
                   "the real body of the article with plain words")


def test_main_content_thresholds_are_exact(spark):
    from malstrom_spark.functions.html import main_content_text

    # exactly AT the density threshold is dropped (strict <)
    html = '<p>one <a href="/x">two</a></p>'  # 2 words, 1 link word = 50%
    df = spark.createDataFrame([(1, html)], "id long, html string")
    got = df.select(main_content_text(
        F.col("html"), max_link_density_pct=50, min_words=1
    ).alias("t")).collect()[0]["t"]
    assert got == ""


def test_sniff_charset_priority_and_fallback():
    from malstrom_spark.sources.warc import sniff_charset

    # BOM wins over everything
    assert sniff_charset(
        b"Content-Type: text/html; charset=latin-1",
        b"\xef\xbb\xbfhi") == "utf-8-sig"
    # header charset beats meta
    assert sniff_charset(
        b"Content-Type: text/html; charset=ISO-8859-1",
        b'<meta charset="utf-8">') == "iso-8859-1"
    # meta charset when header silent
    assert sniff_charset(b"", b'<html><meta charset="windows-1252">') == \
        "windows-1252"
    # http-equiv form
    assert sniff_charset(
        b"", b'<meta http-equiv="Content-Type" '
             b'content="text/html; charset=latin-1">') == "latin-1"
    # unknown label and no declaration both fall back to utf-8
    assert sniff_charset(b"Content-Type: x; charset=bogus-enc", b"") == "utf-8"
    assert sniff_charset(b"", b"<p>plain</p>") == "utf-8"


def test_response_text_decodes_declared_charset(spark, tmp_path):
    from malstrom_spark.sources.warc import response_text, warc_source

    # latin-1 body: 0xe9 = e-acute, invalid as UTF-8 — the charset
    # declaration must be honored, not replaced to U+FFFD
    body = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=ISO-8859-1\r\n\r\n"
            b"<p>caf\xe9</p>")
    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Record-ID: <urn:uuid:c1>\r\n"
           b"WARC-Target-URI: https://a.example/l1\r\n"
           b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
           + body + b"\r\n\r\n")
    (tmp_path / "seg.warc").write_bytes(raw)
    [row] = response_text(warc_source(spark, str(tmp_path))).collect()
    assert row["text"] == "café"


# --------------------------- round-9 self-review regression pins
def test_unclosed_anchor_in_skipped_subtree_does_not_poison_blocks():
    """An unclosed <a> inside <noscript> must not mark the rest of the
    page as link text (would empty main_content_text for the doc)."""
    from malstrom_spark.functions.html import html_blocks_py

    html = ('<noscript><a href="/x">nav</noscript>'
            "<p>ten real words of genuine article body content here</p>")
    assert html_blocks_py(html) == [
        ("ten real words of genuine article body content here", 9, 0)]


def test_links_inside_skipped_subtrees_are_dropped():
    from malstrom_spark.functions.html import extract_links_py

    html = ('<noscript><a href="https://t.example/px">x</a></noscript>'
            '<template><a href="https://t.example/tpl">y</a></template>'
            '<a href="https://ok.example/real">real</a>')
    assert extract_links_py(html) == [("https://ok.example/real", "real")]


def test_boilerplate_pattern_respects_word_boundaries():
    from malstrom_spark.functions.html import (
        _BOILERPLATE_PATTERN, strip_boilerplate_lines)
    import re

    rx = re.compile(_BOILERPLATE_PATTERN)
    kept = ["the design industry grew fast last year",
            "the catalog includes fine woodwork",
            "dialog in the second act is sharp",
            "the recipe for chocolate cookies is simple"]
    dropped = ["Cookie Policy", "We use cookies to improve the site",
               "Copyright 2024 Example Corp", "All Rights Reserved.",
               "Sign in to continue", "Log in", "© 2020 Site"]
    for line in kept:
        assert not rx.search(line), f"false positive: {line!r}"
    for line in dropped:
        assert rx.search(line), f"missed boilerplate: {line!r}"


def test_html_to_text_fuzz_never_raises_and_output_invariants():
    """Crawl HTML is adversarial by default: random tag soup, stray
    brackets, half-entities, nulls. The extractor must never raise,
    and its output postconditions (lines stripped, single-spaced,
    non-empty) must hold for ANY input — downstream Column filters
    (strip_boilerplate_lines word counts) rely on them."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    soup = st.lists(
        st.sampled_from(
            list("<>/&;#abcz \t\n\r\"'=!-") + ["<p", "</p>", "<script",
                 "</script>", "&amp", "<a href=", "<!--", "-->", "<br"]
        ),
        max_size=60,
    ).map("".join)

    @settings(max_examples=200, deadline=None)
    @given(soup)
    def check(h):
        out = html_to_text_py(h)
        for ln in out.split("\n") if out else []:
            assert ln == " ".join(ln.split()) and ln != ""

    check()


def test_html_family_plans_are_shuffle_free(spark, sf_dir):
    """The whole HTML family is scan-parallel: zero Exchange in every
    registry row's plan (the 100 TB shape claim, pinned)."""
    from malstrom_spark.queries import full_registry

    fr = full_registry()
    for name in ("doc_html_extract", "doc_html_links", "doc_html_meta",
                 "doc_html_main_text", "doc_robots_filter"):
        plan = fr[name].fn(spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan, f"{name} plan shuffles"


# ---------------------------------------------- meta robots (r11)
def test_meta_robots_py_variants():
    from malstrom_spark.functions.html import meta_robots_py

    assert meta_robots_py("<html><body>x</body></html>") == (False, False)
    assert meta_robots_py('<meta name="robots" content="noindex">') == (True, False)
    assert meta_robots_py('<META NAME="ROBOTS" CONTENT="NOFOLLOW">') == (False, True)
    assert meta_robots_py('<meta name="robots" content="none">') == (True, True)
    assert meta_robots_py('<meta name="robots" content="all">') == (False, False)
    assert meta_robots_py(
        '<meta name="robots" content="noindex"><meta name="robots" content="nofollow">'
    ) == (True, True)
    # token list with whitespace; unrelated meta names ignored
    assert meta_robots_py('<meta name="robots" content=" NOINDEX , follow ">') == (True, False)
    assert meta_robots_py('<meta name="viewport" content="noindex">') == (False, False)
    # space-separated directives (seen in the wild, engines tolerate):
    # the consent filter must fail CLOSED, not parse one unknown token
    assert meta_robots_py('<meta name="robots" content="noindex nofollow">') == (True, True)
    assert meta_robots_py('<meta name="robots" content="none follow">') == (True, True)
    # malformed html restricts nothing
    assert meta_robots_py("<meta <<<") == (False, False)
