"""robots.txt (RFC 9309) crawl-politeness filtering.

The crawl front-end in this engine is warc_source -> response_text ->
html_to_text/extract_links -> url kit -> dedup/quality; a production
crawler must also honor per-host robots.txt rules when deciding which
frontier URLs to fetch. This module parses robots.txt the RFC 9309
way and evaluates URLs against the rules at scan parallelism:

- **parse_robots**: group selection per RFC 9309 §2.2.1 — the group
  whose user-agent line is the LONGEST match for the crawler's
  product token wins; `*` groups apply only when no specific group
  matches; multiple user-agent lines may share one group. Rules keep
  their pattern verbatim (with `*` wildcards and `$` end anchor).
- **robots_allowed_py**: RFC 9309 §2.2.2 longest-match evaluation —
  the matching rule with the most specific (longest) pattern wins;
  ties break to Allow; no matching rule means allowed; an empty
  Disallow line means allow-all (the classic grammar quirk).
- **robots_allowed**: the Spark form. Rule sets ride as ONE broadcast
  dict {host -> [(pattern, allow, regex)]} (rule tables are tiny —
  tens of lines per host — next to the URL table), evaluated in an
  Arrow-batched pandas_udf: zero shuffle, zero join, the PSL/Bloom
  broadcast discipline. A host with no robots.txt entry is allowed
  (fetch-nothing-on-missing is a crawler policy choice layered above).

No reference analog (the reference is a dataflow kernel; this is
north-star crawl-pipeline capability like functions/url.py)."""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: F401  (API symmetry)


def _pattern_regex(pattern: str) -> "re.Pattern[str]":
    """robots pattern -> anchored regex: `*` matches any run, a
    trailing `$` anchors the end, everything else is literal."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return re.compile("^" + rx + ("$" if anchored else ""))


def parse_robots(
    content: str, user_agent: str = "*"
) -> list[tuple[str, bool]]:
    """[(pattern, allow)] for the group governing `user_agent`.
    RFC 9309 group selection: most-specific user-agent token match
    wins; `*` is the fallback; unknown directives are ignored; blank
    lines and comments separate nothing (groups end at the next
    user-agent run)."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_agents = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_agents and cur_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(val.lower())
            in_agents = True
        elif key in ("allow", "disallow"):
            in_agents = False
            if not cur_agents:
                continue  # rules before any user-agent line: ignored (RFC)
            if key == "disallow" and not val:
                continue  # empty Disallow = allow-all (no rule)
            if val:
                cur_rules.append((val, key == "allow"))
        # crawl-delay/sitemap/other directives: ignored WITHOUT
        # terminating a start-of-group user-agent run (RFC 9309 §2.2.2:
        # unrecognized lines are skipped; only real group-member rules
        # end the run). 'User-agent: a / Sitemap: x / User-agent: b /
        # Disallow: /' is ONE group governing both a and b — splitting
        # it would leave agent a allow-all against the site's intent.
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    # An agent token matches when it is a (case-insensitive) substring
    # of OUR product token — never the reverse: 'googlebot-images'
    # must not govern 'googlebot' (its rules are someone else's).
    # Most-specific (longest) token wins; ALL groups at the winning
    # specificity merge (concatenated robots files repeat groups —
    # RFC 9309 says groups governing the same agent combine), and the
    # '*' fallback likewise merges every '*' group.
    def match_len(a: str) -> int:
        return len(a) if a != "*" and a in ua else -1

    best_len = max(
        (match_len(a) for agents, _ in groups for a in agents), default=-1
    )
    merged: list[tuple[str, bool]] = []
    if best_len >= 0:
        for agents, rules in groups:
            if any(match_len(a) == best_len for a in agents):
                merged.extend(rules)
    else:
        for agents, rules in groups:
            if "*" in agents:
                merged.extend(rules)
    return merged


def robots_allowed_py(path: str, rules: list[tuple[str, bool]]) -> bool:
    """RFC 9309 longest-match: among matching rules the longest
    pattern wins, ties to Allow; no match = allowed."""
    best = (-1, True)
    for pattern, allow in rules:
        if _pattern_regex(pattern).match(path):
            key = (len(pattern), allow)
            if key > best:
                best = key
    return best[1]


def robots_allowed(
    url_col: Column,
    robots_by_host: dict[str, str],
    user_agent: str = "*",
) -> Column:
    """BOOLEAN Column: may `user_agent` fetch each URL, per its host's
    robots.txt in `robots_by_host` (host -> raw robots.txt text —
    typically collected from a tiny fetched-robots table)? Hosts
    absent from the dict are allowed. Parsing happens ONCE driver-side
    (the dict is construction-time small); compiled rules broadcast to
    executors inside the Arrow-batched pandas_udf closure — zero
    shuffle, zero join, same shape as the PSL literal maps but with
    per-host fan-out a literal map can't express."""
    from urllib.parse import urlsplit

    from pyspark.sql.functions import pandas_udf

    compiled: dict[str, list[tuple[int, bool, "re.Pattern[str]"]]] = {}
    for host, content in robots_by_host.items():
        rules = parse_robots(content, user_agent)
        compiled[host.lower()] = [
            (len(p), allow, _pattern_regex(p)) for p, allow in rules
        ]

    @pandas_udf("boolean")
    def _allowed(urls: pd.Series) -> pd.Series:
        def check(u) -> bool | None:
            if u is None:
                return None
            try:
                parts = urlsplit(u)
            except ValueError:
                return False
            rules = compiled.get((parts.hostname or "").lower())
            if not rules:
                return True
            path = parts.path or "/"
            if parts.query:
                path += "?" + parts.query
            best = (-1, True)
            for plen, allow, rx in rules:
                if rx.match(path):
                    key = (plen, allow)
                    if key > best:
                        best = key
            return best[1]

        return urls.map(check)

    return _allowed(url_col)
