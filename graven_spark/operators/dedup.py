"""URL-seen dedup: first-occurrence batch dedup + Bloom-prefiltered exact
anti-join admission (SURVEY.md §2.3 J1, §2.7 U2/U3; reference semantics:
check-then-insert on a UNIQUE ``uri`` key,
/root/reference/graven/worker/crawler.py:82-84 +
/root/reference/graven/db/graven_database.py:103-115 — our MERGE-style
admission is the race-free version, SURVEY.md §7.4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import BloomSpec, probe


def first_occurrence(candidates: DataFrame, key: str = "url", order: str = "priority") -> DataFrame:
    """Within-batch dedup keeping the smallest ``order`` row per ``key`` —
    the FIFO first-occurrence the reference's serial seen-probe produces.
    min(struct(order, ...)) is a single map-side-combinable aggregate: no
    window, no second shuffle."""
    others = [c for c in candidates.columns if c not in (key, order)]
    packed = F.min(F.struct(F.col(order), *[F.col(c) for c in others])).alias("_r")
    return (
        candidates.groupBy(key)
        .agg(packed)
        .select(key, f"_r.{order}", *[f"_r.{c}" for c in others])
    )


def admit_new(
    candidates: DataFrame,
    seen: DataFrame,
    shards: DataFrame | None = None,
    spec: BloomSpec | None = None,
) -> DataFrame:
    """Rows of ``candidates`` whose url is not in ``seen``.

    With Bloom shards, membership is decided in a **single pass**: the
    broadcast probe adds ``maybe_seen`` and the exact check is one
    conditional anti-join — ``LEFT ANTI ON (url = url AND maybe_seen)`` —
    so bloom-negative rows (no false negatives possible) can never match
    and are admitted without ever probing the seen side's hash table, while
    bloom-positive suspects get the exact string comparison. One join, no
    plan duplication (a union of filtered branches would execute the whole
    upstream — politeness, ranking, Arrow extraction — twice).

    Without shards: plain exact anti-join. ``seen`` is always read with
    column pruning (url only)."""
    seen_urls = seen.select("url")
    if shards is None:
        return candidates.join(seen_urls, "url", "left_anti")
    probed = probe(candidates, shards, spec or BloomSpec())
    cond = (probed["url"] == seen_urls["url"]) & probed["maybe_seen"]
    return probed.join(seen_urls, cond, "left_anti").drop("maybe_seen")
