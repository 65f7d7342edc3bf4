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
    ``min(order)`` + ``min_by(others, order)`` is a single map-side-
    combinable aggregate: no window, no second shuffle — and unlike
    ``min(struct(...))`` (whose struct buffer forces SortAggregate, i.e. a
    full sort on both sides of the exchange) ``min_by`` is a typed
    imperative aggregate that runs as ObjectHashAggregate, sort-free."""
    others = [c for c in candidates.columns if c not in (key, order)]
    aggs = [F.min(F.col(order)).alias(order)]
    if others:
        aggs.append(
            F.min_by(F.struct(*[F.col(c) for c in others]), F.col(order)).alias("_r")
        )
    out = candidates.groupBy(key).agg(*aggs)
    if others:
        out = out.select(key, order, *[f"_r.{c}" for c in others])
    return out


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
