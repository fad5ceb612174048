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
    "(?i)(cookie|copyright|all rights reserved|privacy policy"
    "|terms of (use|service)|enable javascript|javascript is (required"
    "|disabled)|subscribe to our newsletter|skip to (main )?content"
    "|log ?in|sign ?(in|up)|©)"
)


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
