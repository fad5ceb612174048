"""Raw-HTML -> text extraction for the crawl-ingestion path.

A real Common Crawl pipeline starts at WARC *response* records
carrying raw HTML, not at WET pre-extracted text — this module is the
missing stage between `sources/warc.py` and the `doc_*` text
pipeline. No reference analog (the reference is a dataflow kernel,
malstrom-core/src/operators/mod.rs:17-33, with no content functions);
the semantics follow the de-facto extraction contract of WET
generation and C4 (Raffel et al. 2020 §2.2): drop non-content
elements, decode entities, break lines at block elements, collapse
whitespace.

Extraction rules (deterministic, hence oracle-checkable on seeded
HTML — see queries/pipeline.py doc_html_extract):

- `<script>`, `<style>`, `<template>`, `<noscript>` subtrees are
  dropped entirely (including markup nested inside them).
- Comments, declarations and processing instructions are dropped.
- Block-level elements (p, div, h1-h6, li, tr, td, title, pre, ...)
  start/end a line; inline tags (b, i, a, span, ...) are stripped in
  place; `<br>` breaks a line.
- Character/entity references are decoded once (`&amp;` -> `&`,
  `&#97;` -> `a`); the decode is stdlib `html.parser`'s own.
- Whitespace: raw newlines in source text are ordinary whitespace
  (only block tags break lines); each output line is
  whitespace-collapsed and stripped; empty lines are dropped; lines
  join with `\n`. `<pre>` is NOT whitespace-preserved (documented
  simplification — training-data text is whitespace-collapsed
  downstream anyway).
- Malformed HTML never raises: stdlib HTMLParser is lenient
  (unclosed tags, stray end tags, uppercase tags, bare attributes),
  matching crawl reality.

Scale shape: parsing is genuinely inexpressible in Spark SQL, so this
is one of the few sanctioned Python paths — an Arrow-batched
pandas_udf (never row-at-a-time F.udf), a zero-shuffle projection
that runs at scan parallelism. The boilerplate line filter is
pure-Column (JVM codegen, HOF filter over split lines) so it costs
nothing extra. Chain: warc_source -> response_text -> html_to_text ->
strip_boilerplate_lines -> corpus.clean_lines (C4) -> quality/dedup.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Subtrees dropped entirely (content AND nested markup).
_SKIP_TAGS = frozenset({"script", "style", "template", "noscript"})

# Elements that start/end an output line. Inline elements (a, b, i,
# em, span, code, ...) are anything not listed here.
_BLOCK_TAGS = frozenset({
    "address", "article", "aside", "blockquote", "br", "caption",
    "dd", "details", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "li", "main", "nav", "ol", "option", "p", "pre",
    "section", "select", "summary", "table", "tbody", "td", "tfoot",
    "th", "thead", "title", "tr", "ul",
})

_NL = re.compile(r"[\n\r]")


class _TextExtractor(HTMLParser):
    """Streaming extractor: text chunks accumulate; block tags insert
    line breaks; skip-depth counter suppresses non-content subtrees
    (script/style content arrives through handle_data in CDATA mode,
    noscript/template children are parsed as normal markup — both are
    suppressed while _skip > 0)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._parts: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif self._skip == 0 and tag in _BLOCK_TAGS:
            self._parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)  # stray closers are no-ops
        elif self._skip == 0 and tag in _BLOCK_TAGS:
            self._parts.append("\n")

    def handle_data(self, data: str) -> None:
        if self._skip == 0 and data:
            # raw newlines in source are ordinary whitespace — only
            # block tags (the "\n" parts above) break output lines
            self._parts.append(_NL.sub(" ", data))

    def text(self) -> str:
        lines = []
        for ln in "".join(self._parts).split("\n"):
            ln = " ".join(ln.split())
            if ln:
                lines.append(ln)
        return "\n".join(lines)


def html_to_text_py(html: str) -> str:
    """Pure-Python extraction (the oracle/test twin and the kernel the
    pandas_udf batches over). Never raises on malformed input."""
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:  # pragma: no cover — HTMLParser is lenient by design
        pass
    return p.text()


def html_to_text(col: Column) -> Column:
    """Column form: raw HTML string -> extracted text. Arrow-batched
    pandas_udf (the sanctioned Python path — parsing has no SQL
    expression); NULL in -> NULL out."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _extract(s: pd.Series) -> pd.Series:
        return s.map(lambda h: None if h is None else html_to_text_py(h))

    return _extract(col)


# Lines matching any of these are navigation/footer boilerplate, not
# content — the high-precision subset every public extractor agrees
# on (trafilatura/jusText/C4 badwords all carry supersets).
_BOILERPLATE_PATTERN = (
    r"(?i)(\bcookie policy\b|\bwe use cookies\b|\baccept (all )?cookies\b"
    r"|\bcopyright (©|\d{4})|© ?\d{4}|\ball rights reserved\b"
    r"|\bprivacy policy\b|\bterms of (use|service)\b"
    r"|\benable javascript\b|\bjavascript is (required|disabled)\b"
    r"|\bsubscribe to our newsletter\b|\bskip to (main )?content\b"
    r"|\blog ?in\b|\bsign ?(in|up)\b)"
)


class _LinkExtractor(HTMLParser):
    """Collects (href, anchor_text) pairs: anchor text is the
    whitespace-collapsed visible text between <a href=...> and </a>
    (inline markup stripped in place, non-content subtrees dropped —
    same rules as _TextExtractor). A nested/unclosed <a> finalizes the
    previous one (crawl-reality leniency); an <a> open at EOF is
    finalized by close()."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._text: list[str] = []
        self._skip = 0

    def _finish(self) -> None:
        if self._href is not None:
            self.links.append((self._href, " ".join("".join(self._text).split())))
        self._href, self._text = None, []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag == "a" and self._skip == 0:
            self._finish()
            href = next((v for k, v in attrs if k == "href"), None)
            if href is not None:
                self._href = href.strip()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag == "a" and self._skip == 0:
            self._finish()

    def handle_data(self, data: str) -> None:
        if self._skip == 0 and self._href is not None and data:
            self._text.append(data)

    def close(self) -> None:  # finalize an <a> left open at EOF
        super().close()
        self._finish()


class _BlockExtractor(HTMLParser):
    """Splits the page into text blocks at block-element boundaries
    and counts, per block, total words and words inside <a> anchors —
    the two signals the classic content/boilerplate classifiers
    (Kohlschütter et al. 2010 boilerpipe; jusText) key on: navigation,
    footers and link farms have high link density and short blocks,
    article text has low link density and long blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        self._parts: list[str] = []
        self._anchor_words = 0
        self._a_depth = 0
        self._skip = 0

    def _finish_block(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            n = len(text.split())
            self.blocks.append((text, n, min(self._anchor_words, n)))
        self._parts, self._anchor_words = [], 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag == "a" and self._skip == 0:
            # anchors inside skipped subtrees must not leak depth: an
            # unclosed <a> in <noscript> would otherwise mark every
            # later word as link text and empty the whole page
            self._a_depth += 1
        elif self._skip == 0 and tag in _BLOCK_TAGS:
            self._finish_block()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag == "a" and self._skip == 0:
            self._a_depth = max(0, self._a_depth - 1)
        elif self._skip == 0 and tag in _BLOCK_TAGS:
            self._finish_block()

    def handle_data(self, data: str) -> None:
        if self._skip == 0 and data:
            self._parts.append(_NL.sub(" ", data))
            if self._a_depth > 0:
                self._anchor_words += len(data.split())

    def close(self) -> None:
        super().close()
        self._finish_block()


def html_blocks_py(html: str) -> list[tuple[str, int, int]]:
    """(text, n_words, link_words) per block. Never raises."""
    p = _BlockExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:  # pragma: no cover
        pass
    return p.blocks


def html_blocks(col: Column) -> Column:
    """Column form: array<struct<text, n_words, link_words>> — the
    feature table main-content extraction filters on. Arrow-batched;
    NULL in -> NULL out."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<text: string, n_words: int, link_words: int>>")
    def _blocks(s: pd.Series) -> pd.Series:
        return s.map(lambda h: None if h is None else html_blocks_py(h))

    return _blocks(col)


def main_content_text(
    col: Column,
    max_link_density_pct: int = 50,
    min_words: int = 3,
) -> Column:
    """Main-content extraction: keep blocks with at least `min_words`
    words and link density below `max_link_density_pct` percent
    (integer arithmetic — `link_words * 100 < pct * n_words` — so the
    threshold is engine-exact), drop the rest (nav bars, footers,
    related-links boxes), join survivors with newlines. The block
    split is the one Python hop (html_blocks); the classification and
    join are pure Column HOFs — codegen, zero shuffle. This is the
    density heuristic of boilerpipe/jusText without their trained
    models: high-precision on the structural boilerplate that
    dominates crawl noise."""
    blocks = html_blocks(col)
    kept = F.filter(
        blocks,
        lambda b: (b["n_words"] >= F.lit(min_words))
        & (b["link_words"] * 100 < F.lit(max_link_density_pct) * b["n_words"]),
    )
    return F.array_join(F.transform(kept, lambda b: b["text"]), "\n")


#: href schemes that are not crawlable links
_NON_HTTP = ("javascript:", "mailto:", "tel:", "data:", "ftp:", "file:",
             "about:", "blob:")


def extract_links_py(
    html: str, base_url: str | None = None
) -> list[tuple[str, str]]:
    """(resolved_url, anchor_text) pairs from raw HTML. Relative hrefs
    resolve against `base_url` per RFC 3986 (stdlib urljoin —
    protocol-relative, rooted, and dotted paths all standard);
    non-http(s) schemes, empty hrefs and fragment-only hrefs are
    dropped; fragments are stripped from kept links (the URL-dedup
    convention url_normalize also applies). Without a base_url only
    absolute links survive. Never raises on malformed markup."""
    from urllib.parse import urljoin

    p = _LinkExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:  # pragma: no cover
        pass
    out: list[tuple[str, str]] = []
    for href, text in p.links:
        if not href or href.startswith("#"):
            continue
        low = href.lower()
        if low.startswith(_NON_HTTP):
            continue
        try:
            url = urljoin(base_url, href) if base_url else href
        except ValueError:  # e.g. malformed port in the href authority
            continue
        if not url.lower().startswith(("http://", "https://")):
            continue
        url = url.split("#", 1)[0]
        out.append((url, text))
    return out


def extract_links(html_col: Column, base_url_col: Column) -> Column:
    """Column form: array<struct<href, anchor>> of the page's resolved
    crawlable links — the edge-list feed for the link graph
    (functions/graph.pagerank over url_host keys). Arrow-batched
    pandas_udf; NULL html -> NULL."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<href: string, anchor: string>>")
    def _links(html: pd.Series, base: pd.Series) -> pd.Series:
        return pd.Series([
            None if h is None else extract_links_py(h, b)
            for h, b in zip(html, base)
        ])

    return _links(html_col, base_url_col)


def html_meta_py(html: str) -> tuple[str | None, str | None, str | None]:
    """(title, meta_description, lang) from raw HTML: first <title>
    text (whitespace-collapsed), first <meta name="description">
    content, and the <html lang=...> attribute. Missing -> None."""

    class _Meta(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.title: str | None = None
            self.desc: str | None = None
            self.lang: str | None = None
            self._in_title = False
            self._title_parts: list[str] = []

        def handle_starttag(self, tag, attrs):
            a = dict(attrs)
            if tag == "html" and self.lang is None and a.get("lang"):
                self.lang = a["lang"].strip()
            elif tag == "meta" and self.desc is None:
                if (a.get("name") or "").lower() == "description":
                    self.desc = (a.get("content") or "").strip() or None
            elif tag == "title" and self.title is None:
                self._in_title = True

        def handle_endtag(self, tag):
            if tag == "title" and self._in_title:
                self._in_title = False
                t = " ".join("".join(self._title_parts).split())
                self.title = t or None

        def handle_data(self, data):
            if self._in_title:
                self._title_parts.append(data)

    p = _Meta()
    try:
        p.feed(html)
        p.close()
    except Exception:  # pragma: no cover
        pass
    return (p.title, p.desc, p.lang)


def html_meta(html_col: Column) -> Column:
    """Column form: struct<title, description, lang>. Arrow-batched;
    NULL html -> NULL struct."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<title: string, description: string, lang: string>")
    def _meta(html: pd.Series) -> pd.DataFrame:
        rows = [
            (None, None, None) if h is None else html_meta_py(h)
            for h in html
        ]
        return pd.DataFrame(rows, columns=["title", "description", "lang"])

    return _meta(html_col)


def strip_boilerplate_lines(
    col: Column, min_words: int = 1, pattern: str = _BOILERPLATE_PATTERN
) -> Column:
    """Drop boilerplate lines from extracted text: lines matching the
    nav/footer pattern or shorter than min_words. Pure-Column (split +
    HOF filter + array_join — whole-stage codegen, zero shuffle, no
    Python). Input lines are single-spaced non-empty (html_to_text's
    postcondition), so the word count is a split on ' '. Chain
    corpus.clean_lines after this for the C4 sentence-level rules."""
    keep = lambda l: (~l.rlike(pattern)) & (  # noqa: E731
        F.size(F.split(l, " ")) >= F.lit(min_words)
    )
    return F.array_join(F.filter(F.split(col, "\n"), keep), "\n")


def meta_robots_py(html: str) -> tuple[bool, bool]:
    """(noindex, nofollow) from <meta name="robots"> directives — the
    page-level indexing-consent layer above robots.txt (a crawler may
    FETCH an allowed page yet must not index or follow it). Directive
    tokens are comma-separated per the standard (whitespace-separated
    content is tolerated, as major engines do) and case-insensitive;
    'none' means
    noindex+nofollow, 'all' asserts neither; multiple robots metas
    union their restrictions (most-restrictive-wins, the de-facto
    standard across engines). Absent/malformed metas restrict
    nothing."""

    class _Robots(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.noindex = False
            self.nofollow = False

        def handle_starttag(self, tag, attrs):
            if tag != "meta":
                return
            a = dict(attrs)
            if (a.get("name") or "").strip().lower() != "robots":
                return
            # directives are comma-separated per the standard, but
            # space-separated content ("noindex nofollow") is seen in
            # the wild and tolerated by major engines — split on both
            # so the consent filter fails CLOSED on sloppy markup
            toks = {
                t.lower()
                for t in re.split(r"[,\s]+", a.get("content") or "")
                if t
            }
            if "none" in toks:
                self.noindex = self.nofollow = True
            if "noindex" in toks:
                self.noindex = True
            if "nofollow" in toks:
                self.nofollow = True

    p = _Robots()
    try:
        p.feed(html)
        p.close()
    except Exception:  # pragma: no cover
        pass
    return (p.noindex, p.nofollow)


def meta_robots(html_col: Column) -> Column:
    """Column form: struct<noindex: boolean, nofollow: boolean>.
    Arrow-batched; NULL html restricts nothing (fetch-layer policy
    belongs to robots.txt, not here)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<noindex: boolean, nofollow: boolean>")
    def _robots(html: pd.Series) -> pd.DataFrame:
        rows = [
            (False, False) if h is None else meta_robots_py(h)
            for h in html
        ]
        return pd.DataFrame(rows, columns=["noindex", "nofollow"])

    return _robots(html_col)
