"""Sitemap (sitemaps.org protocol, public) parsing for crawl URL
discovery.

Completes the crawl-discovery front-end: robots.txt
(functions/robots.py) declares per-host `Sitemap:` URLs; each sitemap
payload is an XML `<urlset>` (page URLs + lastmod/changefreq/
priority), an XML `<sitemapindex>` (pointers to child sitemaps), or a
plain-text URL list — any of them optionally gzipped. This module
parses all of those shapes stdlib-only (zlib + xml.etree on bounded
input) and explodes payloads into URL rows at scan parallelism — the
discovery twin of sources/warc.py's fetch path. Output rows feed
functions/crawl.py crawl_frontier (index rows re-enter the fetch
queue; urlset rows are frontier candidates).

Untrusted-input contract (same as warc/html): one adversarial or
malformed sitemap must never fail the job — bad payloads emit zero
rows; decompressed size and entry count are capped (the spec's own
50 MB / 50,000-URL limits), so a gzip bomb or an unbounded generated
file costs one truncated parse, not an executor OOM.

No reference analog (the reference is a dataflow kernel; this is
north-star crawl-pipeline capability like functions/robots.py)."""

from __future__ import annotations

from typing import Iterator
from urllib.parse import urlsplit

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# The protocol's own limits (sitemaps.org): a sitemap file may hold at
# most 50,000 URLs and 50 MB uncompressed. Enforcing them doubles as
# the adversarial-input bound.
SITEMAP_MAX_ENTRIES = 50_000
SITEMAP_MAX_BYTES = 50 * 1024 * 1024


def _http_scheme(url: str) -> bool:
    """True iff the URL parses with an http(s) scheme; a hostile
    authority that makes urlsplit raise (e.g. an unmatched '[') is
    simply not a valid URL — untrusted input must never turn a
    discovery pass into a crash."""
    try:
        return urlsplit(url).scheme in ("http", "https")
    except ValueError:
        return False


def robots_sitemap_urls(content: str) -> list[str]:
    """The `Sitemap:` URLs declared in a robots.txt body — RFC 9309
    treats them as non-group records, so they are collected from
    anywhere in the file (case-insensitive key, order kept, duplicates
    dropped). Only absolute http(s) URLs qualify (the protocol
    requires absolute locations). Shares functions/robots.py's line
    tokenizer so the two modules can never disagree on what a
    robots.txt line is."""
    from .robots import _directive_lines

    out: list[str] = []
    seen: set[str] = set()
    for key, url in _directive_lines(content):
        if key != "sitemap":
            continue
        if _http_scheme(url) and url not in seen:
            seen.add(url)
            out.append(url)
    return out


def _gunzip_bounded(payload: bytes, max_bytes: int) -> bytes:
    """Gzip-decompress with a hard output cap: a bomb yields a loud
    ValueError (callers quarantine), never an OOM. MULTI-MEMBER
    (concatenated) gzip is valid per RFC 1952 and produced by some
    sitemap generators — loop over members until the input is
    consumed, keeping the CUMULATIVE size under the cap, instead of
    silently truncating to the first member."""
    import zlib

    chunks: list[bytes] = []
    remaining = max_bytes + 1
    while True:
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(payload, remaining)
        except zlib.error as e:
            # corrupt member (first or a bad concatenated tail):
            # surface as the ValueError callers quarantine on
            raise ValueError(f"bad gzip member in sitemap: {e}") from e
        chunks.append(chunk)
        remaining -= len(chunk)
        if remaining <= 0:
            raise ValueError(
                "gzipped sitemap exceeds the 50 MB protocol cap")
        if not d.eof:
            # a truncated stream decompresses to a PARTIAL buffer
            # whose final line could be a valid-looking but wrong
            # URL — corrupt data, not a smaller sitemap; quarantine
            raise ValueError("truncated gzip stream in sitemap payload")
        payload = d.unused_data
        if not payload.lstrip(b"\x00"):
            # trailing NUL padding after the last member is common
            # (block-aligned writers); anything else non-gzip is a
            # corrupt tail and falls through to the next member
            # attempt, which raises loudly
            break
    return b"".join(chunks)


def _local(tag: str) -> str:
    """XML tag without its namespace ('{ns}loc' -> 'loc')."""
    return tag.rpartition("}")[2]


def parse_sitemap_bytes(
    payload: bytes,
    max_entries: int = SITEMAP_MAX_ENTRIES,
) -> tuple[str, list[tuple[str, str | None, str | None, float | None]]]:
    """(kind, [(loc, lastmod, changefreq, priority)]) for one sitemap
    payload. kind is 'urlset' (page URLs), 'index' (child-sitemap
    URLs — changefreq/priority always None), or 'text' (the plain-text
    form — one URL per line, no metadata). Gzip is sniffed by magic.
    Raises ValueError on anything unparsable; entries beyond
    `max_entries` are truncated (the spec forbids them; an adversarial
    file must not expand further). Locations must be absolute http(s)
    URLs — others are dropped; an invalid priority parses to None."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_bounded(payload, SITEMAP_MAX_BYTES)
    if len(payload) > SITEMAP_MAX_BYTES:
        raise ValueError("sitemap exceeds the 50 MB protocol cap")
    text = payload.decode("utf-8", errors="replace")
    stripped = text.lstrip("﻿ \t\r\n")
    if not stripped:
        raise ValueError("empty sitemap payload")

    ok_loc = _http_scheme

    if not stripped.startswith("<"):
        # plain-text form: every non-blank line is a URL
        entries = []
        for line in stripped.splitlines():
            u = line.strip()
            if u and ok_loc(u):
                entries.append((u, None, None, None))
            if len(entries) >= max_entries:
                break
        if not entries:
            raise ValueError("no URLs in plain-text sitemap")
        return "text", entries

    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(stripped)
    except ET.ParseError as e:
        raise ValueError(f"malformed sitemap XML: {e}") from e
    kind = _local(root.tag)
    if kind == "urlset":
        child_tag, out_kind = "url", "urlset"
    elif kind == "sitemapindex":
        child_tag, out_kind = "sitemap", "index"
    else:
        raise ValueError(f"not a sitemap root element: {kind!r}")
    entries = []
    for el in root:
        if _local(el.tag) != child_tag:
            continue
        loc = lastmod = changefreq = None
        priority = None
        for f in el:
            name = _local(f.tag)
            val = (f.text or "").strip()
            if name == "loc":
                loc = val
            elif name == "lastmod":
                lastmod = val or None
            elif name == "changefreq" and out_kind == "urlset":
                changefreq = val.lower() or None
            elif name == "priority" and out_kind == "urlset":
                try:
                    priority = float(val)
                except ValueError:
                    priority = None
        if loc and ok_loc(loc):
            entries.append((loc, lastmod, changefreq, priority))
        if len(entries) >= max_entries:
            break
    return out_kind, entries


def sitemap_entries(
    df: DataFrame,
    payload_col: str = "payload",
    sitemap_url_col: str | None = None,
    enforce_host: bool = True,
    max_entries: int = SITEMAP_MAX_ENTRIES,
) -> DataFrame:
    """Explode sitemap payloads into URL rows: passthrough columns
    (minus the payload) + (kind string, loc string, lastmod string,
    changefreq string, priority double). An unparsable payload emits
    ZERO rows (the one-bad-page contract); `kind` distinguishes
    frontier candidates ('urlset'/'text') from child sitemaps
    ('index') so callers can route index rows back into the fetch
    queue and urlset rows into crawl_frontier.

    With `enforce_host` (default ON) and `sitemap_url_col` given, locs
    whose host differs from the sitemap's own host are DROPPED — the
    protocol's cross-submission rule, which otherwise lets any crawled
    page inject frontier URLs for arbitrary hosts.

    100 TB shape: one Arrow-batched mapInPandas over the payload scan
    — zero shuffle, zero Python outside the batch iterator; parse cost
    is bounded by the spec's own 50 MB / 50k-entry caps per payload."""
    keep = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = StructType(
        list(keep)
        + [
            StructField("kind", StringType()),
            StructField("loc", StringType()),
            StructField("lastmod", StringType()),
            StructField("changefreq", StringType()),
            StructField("priority", DoubleType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rep, kinds, locs, mods, freqs, prios = [], [], [], [], [], []
            urls = (
                pdf[sitemap_url_col]
                if sitemap_url_col is not None
                else None
            )
            for r, payload in enumerate(pdf[payload_col]):
                try:
                    kind, entries = parse_sitemap_bytes(
                        bytes(payload), max_entries=max_entries
                    )
                    host = None
                    if enforce_host and urls is not None and urls.iloc[r]:
                        # a malformed sitemap_url (urlsplit raises on a
                        # hostile authority) quarantines the row — with
                        # no trustworthy own-host there is no safe way
                        # to apply the cross-submission rule
                        host = urlsplit(str(urls.iloc[r])).hostname
                except (ValueError, TypeError):
                    continue
                for loc, mod, freq, prio in entries:
                    if host is not None and urlsplit(loc).hostname != host:
                        continue
                    rep.append(r)
                    kinds.append(kind)
                    locs.append(loc)
                    mods.append(mod)
                    freqs.append(freq)
                    prios.append(prio)
            out = (
                pdf.drop(columns=[payload_col])
                .iloc[rep]
                .reset_index(drop=True)
            )
            out["kind"] = kinds
            out["loc"] = locs
            out["lastmod"] = mods
            out["changefreq"] = freqs
            out["priority"] = pd.array(prios, dtype="float64")
            yield out

    return df.mapInPandas(batches, schema=out_schema)
