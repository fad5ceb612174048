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


def _directive_lines(content: str):
    """(key_lower, value) per robots.txt line: comments stripped at
    '#', blank/colon-less lines skipped — THE line tokenizer for
    every robots.txt consumer (group scan here, Sitemap collection in
    functions/sitemap.py), so the directives can never disagree on
    what a line is."""
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        yield key.strip().lower(), val.strip()


def _scan_groups(
    content: str,
) -> list[tuple[list[str], list[tuple[str, bool]], float | None]]:
    """[(agents, rules, crawl_delay)] — one entry per robots.txt
    group. Group-run semantics per RFC 9309: only allow/disallow
    lines end a start-of-group user-agent run; every other directive
    (Crawl-delay, Sitemap, unknown) is skipped WITHOUT interrupting
    parsing (§2.2.4), so 'User-agent: a / Crawl-delay: 5 /
    User-agent: b / Disallow: /' is ONE group governing both agents.
    Crawl-delay (non-standard but universally honored) attaches to
    the group it appears in; an unparsable or negative value is
    ignored; repeated delays keep the LAST (later lines override)."""
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: float | None = None
    in_agents = False
    for key, val in _directive_lines(content):
        if key == "user-agent":
            if not in_agents and cur_agents:
                groups.append((cur_agents, cur_rules, cur_delay))
                cur_agents, cur_rules, cur_delay = [], [], None
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
        elif key == "crawl-delay" and cur_agents:
            try:
                d = float(val)
            except ValueError:
                continue
            if d >= 0:
                cur_delay = d
        # sitemap/other directives: ignored WITHOUT terminating a
        # start-of-group user-agent run (RFC 9309 §2.2.4: parsing of
        # other records must not interrupt the group). 'User-agent: a
        # / Sitemap: x / User-agent: b / Disallow: /' is ONE group
        # governing both a and b — splitting it would leave agent a
        # allow-all against the site's intent.
    if cur_agents:
        groups.append((cur_agents, cur_rules, cur_delay))
    return groups


def _match_len(agent: str, ua: str) -> int:
    """An agent token matches when it is a (case-insensitive)
    substring of OUR product token — never the reverse:
    'googlebot-images' must not govern 'googlebot' (its rules are
    someone else's). -1 = no match; '*' never matches here (it is
    the fallback tier, handled by callers)."""
    return len(agent) if agent != "*" and agent in ua else -1


def _matching_groups(groups, user_agent: str):
    """The groups governing `user_agent`: most-specific (longest)
    token wins; ALL groups at the winning specificity merge
    (concatenated robots files repeat groups — RFC 9309 says groups
    governing the same agent combine); the '*' groups are the
    fallback tier when nothing specific matches."""
    ua = user_agent.lower()
    best_len = max(
        (_match_len(a, ua) for agents, _, _ in groups for a in agents),
        default=-1,
    )
    if best_len >= 0:
        return [
            g for g in groups
            if any(_match_len(a, ua) == best_len for a in g[0])
        ]
    return [g for g in groups if "*" in g[0]]


def parse_robots(
    content: str, user_agent: str = "*"
) -> list[tuple[str, bool]]:
    """[(pattern, allow)] for the group governing `user_agent`.
    RFC 9309 group selection: most-specific user-agent token match
    wins; `*` is the fallback; unknown directives are ignored; blank
    lines and comments separate nothing (groups end at the next
    user-agent run)."""
    merged: list[tuple[str, bool]] = []
    for _, rules, _ in _matching_groups(_scan_groups(content), user_agent):
        merged.extend(rules)
    return merged


def crawl_delay(content: str, user_agent: str = "*") -> float | None:
    """The Crawl-delay (seconds) governing `user_agent`, or None if
    the governing groups declare none. Group selection is IDENTICAL
    to parse_robots (same scan, same specificity/merge rules — one
    code path, so the two directives can never disagree about which
    group governs); when several merged groups declare delays the
    MAXIMUM wins (the conservative read of a self-contradictory
    file). Feed the result to functions/crawl.py
    delay_host_budgets to turn per-host delays into frontier fetch
    budgets."""
    delays = [
        d for _, _, d in _matching_groups(_scan_groups(content), user_agent)
        if d is not None
    ]
    return max(delays) if delays else None


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
