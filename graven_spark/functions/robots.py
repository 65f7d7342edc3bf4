"""RFC 9309 robots.txt parsing + longest-match gating.

The reference crawls a single host and carries no robots handling at all
(its politeness is a global request cap, /root/reference/graven/worker/
crawler.py:27); a web-scale frontier needs the real protocol. Two layers:

- a PURE-PYTHON parser/matcher (:func:`parse_robots_txt`,
  :func:`robots_allowed`) — runs identically on executors (inside the
  Arrow UDF) and in the correctness oracle, the repo's established
  "pure twin" technique;
- a SPARK plan: :func:`rules_from_robots_pages` turns raw robots.txt page
  rows into a tiny per-host rules table (wildcard patterns pre-compiled to
  Java-compatible regexes AT PARSE TIME, once per rule), and
  :func:`robots_allowed_col` evaluates longest-match precedence entirely
  JVM-side — ``F.aggregate`` over the broadcast rules array with
  ``regexp_like``, so the per-URL hot path stays inside whole-stage
  codegen: no Python round-trip per candidate URL at 10^10-URL scale.

RFC 9309 semantics implemented:
- groups of consecutive ``User-agent`` lines share the rules that follow;
- group selection: the longest agent token that occurs in our agent name
  (case-insensitive), falling back to ``*``, else allow-all;
- ``Allow``/``Disallow`` patterns with ``*`` (any chars) and ``$`` (end
  anchor); empty ``Disallow:`` means no rule (allow everything);
- precedence: the longest matching pattern wins; on a length tie, Allow
  wins; no matching rule = allowed;
- ``Sitemap`` lines are global; ``Crawl-delay`` (de-facto extension) is
  kept per group.
Deliberate simplification (documented contract): patterns and paths are
compared as given — no percent-encoding normalization.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.column import Column

# element type of the per-host rules array; plen drives longest-match
RULE_FIELDS = "allow boolean, rx string, plen int"
RULES_SCHEMA = (
    "host string, rules array<struct<allow: boolean, rx: string, plen: int>>, "
    "crawl_delay double, sitemaps array<string>"
)


def pattern_to_regex(pattern: str) -> str:
    """robots path pattern → anchored regex, valid for BOTH Python ``re``
    and Java ``Pattern`` (``re.escape`` only backslash-escapes ASCII
    punctuation, which Java treats identically)."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    body = ".*".join(re.escape(seg) for seg in pattern.split("*"))
    return "^" + body + ("$" if anchored else "")


def parse_robots_txt(text: str, agent: str) -> dict:
    """→ ``{rules: [(allow, pattern)], crawl_delay, sitemaps}`` for the
    group RFC-selected for ``agent``. Pure function: the executor UDF and
    the DuckDB oracle call exactly this."""
    groups: list[tuple[list[str], list[tuple[bool, str]], float | None]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    delay: float | None = None
    in_header = False
    sitemaps: list[str] = []

    def close_group():
        nonlocal agents, rules, delay
        if agents:
            groups.append((agents, rules, delay))
        agents, rules, delay = [], [], None

    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if not in_header:
                close_group()
            agents.append(value.lower())
            in_header = True
        elif field in ("allow", "disallow"):
            in_header = False
            if agents and value:  # empty Disallow: = no rule (RFC 9309 §2.2.2)
                rules.append((field == "allow", value))
        elif field == "crawl-delay":
            in_header = False
            if agents:
                try:
                    delay = float(value)
                except ValueError:
                    pass
        elif field == "sitemap":
            sitemaps.append(value)
    close_group()

    agent_l = agent.lower()
    best: tuple[list[tuple[bool, str]], float | None] | None = None
    best_len = -1
    fallback = None
    for g_agents, g_rules, g_delay in groups:
        for a in g_agents:
            if a == "*":
                if fallback is None:
                    fallback = (g_rules, g_delay)
            elif a in agent_l and len(a) > best_len:
                best, best_len = (g_rules, g_delay), len(a)
    chosen = best if best is not None else fallback
    g_rules, g_delay = chosen if chosen is not None else ([], None)
    return {"rules": g_rules, "crawl_delay": g_delay, "sitemaps": sitemaps}


def robots_allowed(path: str, rules: list[tuple[bool, str]]) -> bool:
    """Longest-match verdict for ``path`` (pure twin of
    :func:`robots_allowed_col`)."""
    verdict, verdict_len = True, -1
    for allow, pattern in rules:
        if re.match(pattern_to_regex(pattern), path):
            plen = len(pattern)
            if plen > verdict_len or (plen == verdict_len and allow and not verdict):
                verdict, verdict_len = allow, plen
    return verdict


def robots_allowed_col(path: Column, rules: Column) -> Column:
    """JVM-side longest-match verdict: fold the (broadcast) rules array,
    keeping the longest matching pattern's allow flag; a length tie keeps
    Allow. NULL/empty rules → allowed. Runs in whole-stage codegen —
    ``regexp_like`` against the pre-compiled per-rule regex — so gating
    10^10 candidate URLs costs no Python."""
    start = F.struct(
        F.lit(True).alias("allow"), F.lit(-1).alias("plen")
    )
    verdict = F.aggregate(
        F.coalesce(rules, F.array()),
        start,
        lambda acc, r: F.when(
            F.regexp_like(path, r["rx"])
            & (
                (r["plen"] > acc["plen"])
                | ((r["plen"] == acc["plen"]) & r["allow"] & ~acc["allow"])
            ),
            F.struct(r["allow"].alias("allow"), r["plen"].alias("plen")),
        ).otherwise(acc),
    )
    return verdict["allow"]


def rules_from_robots_pages(pages, agent: str):
    """pages rows whose url ends in ``/robots.txt`` → per-host rules table
    ``(host, rules, crawl_delay, sitemaps)``. Parsing runs ONCE per robots
    file in an Arrow-batched pandas UDF (robots bodies are the slow,
    irregular part); the result is O(#hosts) rows — broadcast-join fodder,
    never a frontier-sized shuffle. Duplicate robots rows for one host keep
    the lexicographically-first url (deterministic)."""
    from .canon import host_of

    @F.pandas_udf(
        "rules array<struct<allow: boolean, rx: string, plen: int>>, "
        "crawl_delay double, sitemaps array<string>"
    )
    def _parse(body: pd.Series) -> pd.DataFrame:
        out = {"rules": [], "crawl_delay": [], "sitemaps": []}
        for text in body:
            if isinstance(text, (bytes, bytearray)):
                text = text.decode("utf-8", "replace")
            parsed = parse_robots_txt(text, agent)
            out["rules"].append(
                [
                    (allow, pattern_to_regex(p), len(p))
                    for allow, p in parsed["rules"]
                ]
            )
            out["crawl_delay"].append(parsed["crawl_delay"])
            out["sitemaps"].append(parsed["sitemaps"])
        return pd.DataFrame(out)

    robots = (
        pages.filter(F.col("url").endswith("/robots.txt"))
        .withColumn("host", host_of(F.col("url")))
        .groupBy("host")
        .agg(F.min_by(F.col("html"), F.col("url")).alias("body"))
    )
    return robots.select(
        "host", _parse(F.col("body")).alias("p")
    ).select("host", "p.rules", "p.crawl_delay", "p.sitemaps")


def gate_robots_rfc(candidates, rules_df, url_col: str = "url"):
    """Drop candidates an RFC rules table disallows (longest-match). The
    rules side is O(#hosts) → broadcast hash join; the verdict expression
    is JVM-only. Hosts without a robots row are allowed (RFC: fetch
    failure = no restrictions)."""
    from .canon import path_of

    joined = candidates.join(
        F.broadcast(rules_df.select("host", "rules")), "host", "left"
    )
    return joined.filter(
        robots_allowed_col(path_of(F.col(url_col)), F.col("rules"))
    ).drop("rules")
