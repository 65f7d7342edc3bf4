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

    With Bloom shards: bloom-negative rows are admitted join-free (the
    filter has no false negatives); only bloom-positive rows — a tiny,
    mostly-actually-seen slice — reach the exact ``left_anti`` join. Without
    shards: plain exact anti-join. ``seen`` is read with column pruning
    (url only)."""
    seen_urls = seen.select("url")
    if shards is None:
        return candidates.join(seen_urls, "url", "left_anti")
    probed = probe(candidates, shards, spec or BloomSpec())
    definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = suspects.join(seen_urls, "url", "left_anti")
    return definitely_new.unionByName(confirmed_new)
