"""URL analysis for crawl corpora — host/domain extraction,
normalization, path depth: the keys every web-scale pipeline groups
by (per-domain caps, domain blocklists, URL-level dedup; RefinedWeb
§"URL filtering", C4's host-level dedup).

Built from plain regexp/string Columns, NOT `parse_url`, on purpose:
the same character-class-only patterns run identically under Java
regex (Spark) and RE2 (DuckDB), so every function here is
oracle-checkable bit-for-bit. All are zero-shuffle projections.

Scope, stated: absolute http(s)-style URLs. Userinfo (`user@host`)
is stripped; IPv6 bracket hosts and other malformed authorities
normalize to NULL (their colons fail the full-authority check);
`registrable_domain` uses an embedded subset of two-level public
suffixes (the high-traffic ccTLD second-levels) rather than the full
Mozilla PSL — at 100 TB ship the PSL as a broadcast table and map
through it instead; the column form here keeps the hot path
list-free and is right for corpus telemetry and per-domain capping.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
# after scheme: optional userinfo@, then host = everything before
# : / ? #
_HOST = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
# port digits must run to an authority terminator ([/?#] or end) —
# otherwise 'http://h:80x/p' would partial-match port=80 and a junk
# URL could collide with a valid one after normalization. RE2 has no
# lookahead, so the terminator is a non-capturing alternation.
_PORT = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:([0-9]+)(?:[/?#]|$)"
# full-authority validity: host chars + optional :digits must consume
# the ENTIRE authority. Guards url_normalize against malformed
# authorities (bad ports, multiple colons, IPv6 brackets) that the
# per-component extracts would otherwise silently "clean up".
_AUTH_OK = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+(?::[0-9]+)?(?:[/?#]|$)"
_PATH = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
# anchored so a '?' INSIDE the fragment can't resurrect as a query
# ('…/page#sec?x=1' has no query): the chars before the '?' must not
# contain '#'
_QUERY = r"^[^#?]*\?([^#]*)"

# high-traffic two-level public suffixes (PSL subset; see module doc)
TWO_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
]


def url_scheme(url: Column) -> Column:
    """Lowercased scheme, '' when the value isn't an absolute URL."""
    return F.lower(F.regexp_extract(url, _SCHEME, 1))


def url_host(url: Column) -> Column:
    """Lowercased host (userinfo stripped, port excluded); '' for
    non-URLs."""
    return F.lower(F.regexp_extract(url, _HOST, 1))


def url_port(url: Column) -> Column:
    """Explicit port as int; NULL when absent."""
    p = F.regexp_extract(url, _PORT, 1)
    return F.when(p != "", p.cast("int"))


def url_path(url: Column) -> Column:
    """Path component, normalized to '/' when empty."""
    p = F.regexp_extract(url, _PATH, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_path_depth(url: Column) -> Column:
    """Number of non-empty path segments ('/a/b/' -> 2)."""
    segs = F.filter(F.split(url_path(url), "/"), lambda s: s != "")
    return F.size(segs).cast("int")


def url_normalize(url: Column) -> Column:
    """Canonical form for URL-level dedup: lowercased scheme+host,
    userinfo dropped, default port dropped (80 for http, 443 for
    https; other ports kept), fragment dropped, query kept verbatim,
    empty path -> '/'. Non-URL values AND malformed authorities
    (':80x' ports, IPv6 bracket hosts, multiple colons) normalize to
    NULL (filter or quarantine them) — a malformed input must never
    emit a cleaned-looking URL that collides with a valid one during
    URL-level dedup."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    keep_port = port.isNotNull() & ~(
        ((scheme == "http") & (port == 80))
        | ((scheme == "https") & (port == 443))
    )
    q = F.regexp_extract(url, _QUERY, 1)
    auth_ok = F.regexp_extract(url, _AUTH_OK, 0) != ""
    return F.when(
        (scheme != "") & (host != "") & auth_ok,
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port.cast("string"))).otherwise(
                F.lit("")
            ),
            url_path(url),
            F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        ),
    )


def registrable_domain(host: Column) -> Column:
    """eTLD+1 under the embedded two-level-suffix subset: one extra
    label above a known two-level suffix, else the last two labels.
    Single-label hosts (localhost, intranet names) pass through."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    is_two_level = last2.isin(TWO_LEVEL_SUFFIXES)
    return (
        F.when(n <= 1, host)
        .when(
            is_two_level & (n >= 3),
            F.concat_ws(".", F.element_at(parts, -3), last2),
        )
        # a bare two-level suffix (n == 2) falls through to last2 too
        .otherwise(last2)
    )
