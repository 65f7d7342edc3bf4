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

from .bloom import BloomSpec, probe, probe_cogrouped

# Above this total filter size the broadcast probe would strain the driver
# (the 10^10-URL filter is tens of GB); switch to the cogrouped probe where
# shards stay distributed. Overridable per call / via CrawlConfig.
BLOOM_BROADCAST_LIMIT = 256 << 20


def first_occurrence(candidates: DataFrame, key: str = "url", order: str = "priority") -> DataFrame:
    """Within-batch dedup keeping the smallest ``order`` row per ``key`` —
    the FIFO first-occurrence the reference's serial seen-probe produces.

    One ``min(order)`` + a row-atomic ``min_by(struct(others), order)``:
    a single map-side-combinable aggregate — one shuffle, no window, no
    join-back. The struct keeps the result a REAL input row even when
    ``order`` values tie (per-column scalar min_bys could stitch a torn row
    from two tied candidates, nondeterministically — engine priorities are
    unique, but this operator's contract doesn't get to assume that).
    Physical operator: **SortAggregate** (measured; min/min_by buffers over
    string/struct types aren't hash-agg capable), i.e. each side of the
    exchange sorts its partition before combining. Measured alternatives at
    200k rows × 5k keys: scalar min_bys 0.24s (torn-row hazard),
    min_by(struct) 0.30s, min(priority)+shuffled-hash semi-join-back 0.31s —
    the semi-join variant also executes the upstream (the Arrow link-extract
    explode) twice. The partial sort is the documented, cheapest-safe
    option; PLANS.md asserts SortAggregate as the *intended* operator."""
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
    seen: DataFrame | list[DataFrame] | None,
    shards: DataFrame | None = None,
    spec: BloomSpec | None = None,
    broadcast_limit: int = BLOOM_BROADCAST_LIMIT,
    track: list | None = None,
    dedup_first: bool = False,
    shard_bc=None,
) -> DataFrame:
    """Rows of ``candidates`` whose url is in no part of ``seen``.

    ``seen`` is the LSM view of the seen set: the big bucketed base plus the
    small recent deltas (pass a list ordered big→small; a single DataFrame
    or None also works). Each part is one conditional anti-join —
    ``LEFT ANTI ON (url = url AND maybe_seen)`` — so bloom-negative rows
    (no false negatives possible) are admitted without probing any exact
    hash table, while bloom-positive suspects get the exact string check
    against every part. Chaining is cheap: after the first join the
    candidate side is already hash-partitioned on url, so later parts only
    shuffle their own (small) side.

    The Bloom probe path is auto-selected by total filter size:
    ≤ ``broadcast_limit`` ⇒ broadcast probe (no shuffle, scalar pandas UDF);
    above ⇒ cogrouped probe (shards stay distributed). ``track``, when
    given, collects broadcast handles for the caller to destroy after its
    actions complete.

    ``dedup_first=True`` folds the within-batch first-occurrence dedup INTO
    the admission: probe → anti-joins → first_occurrence. The joins run
    BEFORE the aggregate (round 6): candidates shuffle+sort on url exactly
    once for the sort-merge anti-join, the join drops every already-seen
    url, and the aggregate then runs over the join's url-partitioned,
    url-sorted, pre-thinned output with NO further exchange or sort. The
    round-5 order (aggregate first) paid TWO full sorts — the partial
    SortAggregate sorted every map partition before the shuffle, with
    almost no shuffle reduction to show for it (same-url candidates rarely
    co-locate pre-shuffle) — plus the final aggregate over the un-thinned
    set. Results are identical either way: dropping url ∈ seen commutes
    with per-url min-priority selection, and ``maybe_seen`` is a pure
    function of url. (The probe itself is JVM-side since round 6, so no
    Python eval node can hide the join's partitioning from
    EnsureRequirements wherever the aggregate sits.)

    Correctness never depends on the shards (bloom-positive ⇒ exact check);
    it does require the shards to cover the whole seen set — a missing or
    stale shard's false *negative* would skip the exact check. RoundMeta
    records the spec so resume rebuilds on mismatch (frontier.py)."""
    parts = [seen] if isinstance(seen, DataFrame) else list(seen or [])
    if shards is None:
        out = candidates
        for p in parts:
            out = out.join(p.select("url"), "url", "left_anti")
        return first_occurrence(out) if dedup_first else out
    spec = spec or BloomSpec()
    if spec.n_buckets * spec.shard_nbytes > broadcast_limit:
        probed = probe_cogrouped(candidates, shards, spec)
    else:
        # shard_bc: pre-broadcast shard map shared across the batched crawl
        # round's depths (one driver collect per shard GENERATION, not per
        # probe — bloom.broadcast_shard_map)
        probed = probe(candidates, shards, spec, track=track, shard_bc=shard_bc)
    out = probed
    for p in parts:
        pu = p.select(F.col("url").alias("_seen_url"))
        cond = (F.col("url") == F.col("_seen_url")) & F.col("maybe_seen")
        out = out.join(pu, cond, "left_anti")
    out = out.drop("maybe_seen")
    return first_occurrence(out) if dedup_first else out
