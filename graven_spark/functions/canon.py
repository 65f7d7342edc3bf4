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
    """Host component for politeness grouping; JVM-side parse_url."""
    return F.parse_url(url, F.lit("HOST"))


def path_of(url: Column) -> Column:
    """Path component for robots prefix gating."""
    return F.parse_url(url, F.lit("PATH"))


def url_hash(url: Column) -> Column:
    """64-bit salt/bucket key for the seen set & skew-killing repartition
    (SURVEY.md §4.2.1): xxhash64 is JVM-side and cheaper than sha2."""
    return F.xxhash64(url)
