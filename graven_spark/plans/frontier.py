"""One crawl round as a single declarative Spark job (SURVEY.md §3.1):

    frontier_k → politeness select (token buckets) → global FIFO rank
      → fetch join against pages (broadcast the budget-bounded round set)
      → extract links (Arrow UDF) → absolutize → batch dedup (first
        occurrence) → robots gate → Bloom-prefiltered anti-join vs seen
      → split: dirs → frontier_{k+1} ∪ deferred ∪ retries ; leaves →
        fetch join → extract text (Arrow UDF) → results
      → seen MERGE (append delta), lineage rows, shard update, domain
        lifecycle rows, atomic commit.

This replaces the reference's six-thread claim-check pipeline
(/root/reference/graven/worker/pipeline_builder.py:124-224) with
deterministic round membership — no mutable claim state at all.

Scale notes (explicitly engineered, SURVEY.md §4.2):
- the round fetch set is budget-bounded ⇒ it is always the broadcast side of
  the joins against the huge ``pages`` table and against its own derived
  url lists (dead-link detection);
- candidate dedup/admission shuffles hash on url (pmod(xxhash64)) — the salt
  that kills host skew, since one host's URLs spread uniformly;
- the seen set is an LSM: the admission anti-join probes the bucketed,
  url-sorted ``seen_full`` base with NO Exchange and NO Sort on the seen
  side (checkpoint.py), then the small post-compaction deltas (candidates
  are already url-partitioned by then — only the delta side moves);
- ``seen`` is only ever read with column pruning (url) and only probed by
  the bloom-positive slice;
- per-round parquet round-trip keeps the iterative plan O(1) per round;
  every persisted handle and the per-round Bloom broadcast are released
  before the round returns (nothing accumulates over a long crawl).

Retry/requeue (U4, reference /root/reference/graven/worker/generator.py:71-76
+ scanner.py:80-85): a selected directory URL whose fetch fails re-enters
the next round's frontier with ``retry_count + 1`` until
``cfg.max_retries`` is exhausted; every failed attempt is recorded as an
error row (the reference logs each failure too). Leaf download failures are
terminal (the reference retries those inside its HTTP adapter, not via the
queue).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import LISTING_TS_SPARK_FORMAT, PRIORITY_STRIDE, SEED_PRIORITY_BASE
from ..functions.canon import canonicalize, host_of, url_hash
from ..functions.extract import (
    extract_links,
    extract_links_memo,
    extract_text,
    extract_text_memo,
)
from ..operators.bloom import BloomSpec, build_shards, merge_shards
from ..operators.dedup import BLOOM_BROADCAST_LIMIT, admit_new, first_occurrence
from ..operators.politeness import DEFAULT_BUDGET, gate_robots, select_round
from ..operators.ranking import with_global_rank
from ..sources.checkpoint import SEEN_BUCKETS_DEFAULT, RoundMeta, RoundStore

FRONTIER_COLS = [
    "url", "host", "depth", "priority", "parent_url", "discovery_idx", "retry_count",
]


@dataclass
class CrawlConfig:
    run_id: str = "run0"
    use_bloom: bool = True
    bloom: BloomSpec = field(default_factory=BloomSpec)
    default_budget: int = DEFAULT_BUDGET
    n_salts: int = 8
    compact_every: int = 8
    max_rounds: int = 1000
    max_retries: int = 0  # U4: failed dir fetches requeue up to this many times
    # --jar-limit analog (T3; reference downloader.py:60,188-195 semaphore
    # capping jars in flight): global per-round fetch cap applied AFTER the
    # global FIFO rank — the first jar_limit URLs in priority order fetch,
    # the rest defer to the next round with their priorities intact (so the
    # deferred set re-ranks ahead of newer discoveries, exactly the
    # reference's "waiting on the semaphore" queue position). None = off.
    jar_limit: int | None = None
    # RFC robots Crawl-delay → per-host round budget: one round models this
    # many seconds of wall time (None = Crawl-delay lines are inert).
    delay_window_s: float | None = None
    # RFC 3986 syntactic normalization (functions/urlnorm.py) applied to
    # seeds and discovered URLs BEFORE the seen probe, collapsing aliases
    # like /a/../b vs /b into one frontier row. Off by default: the
    # reference's concat absolutization does no normalization, so replay
    # parity requires the raw strings.
    normalize_urls: bool = False
    # Content-dedup extraction flag. Since round 6 the extractors are pure
    # JVM expressions (functions/extract.py) — cheaper than hashing bodies —
    # so the batch-local memo twins are the plain extractors (identical
    # results, flag is a no-op on the plan) and the global groupBy(body_sha)
    # variant (functions/extract.dedup_body_extract) remains the documented/
    # oracled alternative, still slower at every measured duplicate rate
    # (bench `dedup_extract` micro).
    dedup_content: bool = False
    seen_buckets: int = SEEN_BUCKETS_DEFAULT
    bloom_broadcast_limit: int = BLOOM_BROADCAST_LIMIT
    # Frontier-size-adaptive round batching (SURVEY.md §7.4.5): when the
    # frontier holds fewer than batch_threshold rows, up to max_batch_rounds
    # logical depths are processed IN MEMORY before one parquet round-trip +
    # commit — deep, narrow crawl tails (chain graphs, retry dribbles) stop
    # paying per-depth driver/commit overhead. 0 = off (one commit per
    # depth). Logical round stamps, priorities and lineage are preserved
    # exactly; only the per-depth frontier *snapshots* are skipped.
    batch_threshold: int = 0
    max_batch_rounds: int = 16
    # --update-domain analog: hosts to purge from seen + re-seed on resume.
    # The sentinel "*" (the -u/--update CLI flag) re-opens EVERY recorded
    # host by joining against the domains table — never a collected list,
    # so a multi-million-host crawl state stays off the driver.
    update_domains: list[str] | str = field(default_factory=list)
    # --update-jar analog: re-fetch+re-extract seen leaf urls with this prefix.
    update_url_prefix: str | None = None


def _seen_delta(new_urls: DataFrame) -> DataFrame:
    return new_urls.select(
        url_hash(F.col("url")).alias("url_hash"), "url"
    )


def _meta_bloom(cfg: CrawlConfig) -> dict:
    return {
        "bloom_on": cfg.use_bloom,
        "bloom_buckets": cfg.bloom.n_buckets if cfg.use_bloom else 0,
        "bloom_bits": cfg.bloom.bits_per_shard if cfg.use_bloom else 0,
        "bloom_hashes": cfg.bloom.n_hashes if cfg.use_bloom else 0,
    }


def _domains_step(
    prev: DataFrame, next_frontier: DataFrame, next_round: int
) -> DataFrame:
    """Domain lifecycle fold (reference crawl_start/crawl_end stamps +
    COMPLETED gate, /root/reference/graven/db/graven_database.py:188-210):
    a host is IN_PROGRESS while it has frontier rows; its first absence
    stamps COMPLETED/end_round; re-discovery re-opens it. Tiny data — one
    row per host ever seen.

    One tagged union + one groupBy(host): the round-5 shape
    (distinct + full-outer join) shuffled three times per depth for the
    same fold; ``prev`` holds at most one row per host, so max() over the
    union recovers its fields and max(_f) is the presence test — identical
    output rows."""
    u = prev.select(
        "host", "start_round", "end_round", F.lit(False).alias("_f")
    ).unionByName(next_frontier.select(
        "host",
        F.lit(None).cast("int").alias("start_round"),
        F.lit(None).cast("int").alias("end_round"), F.lit(True).alias("_f"),
    ))
    agg = u.groupBy("host").agg(
        F.max("_f").alias("_present"),
        F.max("start_round").alias("_start"),
        F.max("end_round").alias("_end"),
    )
    return agg.select(
        "host",
        F.when(F.col("_present"), F.lit("IN_PROGRESS"))
        .otherwise(F.lit("COMPLETED"))
        .alias("status"),
        F.coalesce(F.col("_start"), F.lit(next_round)).alias("start_round"),
        F.when(F.col("_present"), F.lit(None).cast("int"))
        .otherwise(F.coalesce(F.col("_end"), F.lit(next_round)))
        .alias("end_round"),
    )


def validated_shards(
    spark: SparkSession, store: RoundStore, meta: RoundMeta, cfg: CrawlConfig, k: int
) -> tuple[DataFrame | None, bool]:
    """Round k's Bloom shards, rebuilt from the full seen set when they are
    missing or were built with a different spec (a mismatched shard's false
    negative would skip the exact check and admit a duplicate — the spec is
    part of the checkpoint contract, recorded in RoundMeta). Returns
    ``(shards, rebuilt)`` — a rebuild must be persisted as a new FULL shard
    baseline, since the stored delta chain carries the old spec."""
    if not cfg.use_bloom:
        return None, False
    spec_ok = (
        meta.bloom_on
        and meta.bloom_buckets == cfg.bloom.n_buckets
        and meta.bloom_bits == cfg.bloom.bits_per_shard
        and meta.bloom_hashes == cfg.bloom.n_hashes
    )
    shards = store.read_shards(spark, k) if spec_ok else None
    if shards is None:
        return build_shards(store.read_seen(spark, k), cfg.bloom), True
    return shards, False


def init_run(
    spark: SparkSession,
    store: RoundStore,
    seeds: DataFrame,
    robots: DataFrame | None,
    cfg: CrawlConfig,
) -> RoundMeta:
    """Seed admission → round 0 state (reference: crawler.py:189-203; seed
    file order is the inter-root priority, cli_parser.py:246-259)."""
    seed_url = canonicalize(F.col("url"))
    if cfg.normalize_urls:
        from ..functions.urlnorm import normalize_url

        seed_url = normalize_url(seed_url)
    cand = (
        seeds.select(
            seed_url.alias("url"),
            F.col("seed_rank").cast("long").alias("priority"),
        )
        .withColumn("host", host_of(F.col("url")))
        .withColumn("depth", F.lit(0))
        .withColumn("parent_url", F.lit(None).cast("string"))
        .withColumn("discovery_idx", F.col("priority").cast("int"))
        .withColumn("retry_count", F.lit(0))
    )
    cand = gate_robots(cand, robots)
    frontier0 = first_occurrence(cand).select(*FRONTIER_COLS)

    store.write(0, "frontier", frontier0)
    frontier0 = store.read_frontier(spark, 0)
    store.write(0, "seen_delta", _seen_delta(frontier0))
    store.write(
        0,
        "domains",
        frontier0.select("host").distinct().select(
            "host",
            F.lit("IN_PROGRESS").alias("status"),
            F.lit(0).alias("start_round"),
            F.lit(None).cast("int").alias("end_round"),
        ),
    )
    if cfg.use_bloom:
        store.write(0, "shards", build_shards(frontier0, cfg.bloom))
    meta = RoundMeta(
        round=0,
        priority_base=SEED_PRIORITY_BASE,
        frontier_count=frontier0.count(),
        seen_buckets=cfg.seen_buckets,
        **_meta_bloom(cfg),
    )
    store.commit(0, meta)
    return meta


@dataclass
class _RoundFlow:
    """One logical depth's outputs, all still in memory (next_frontier and
    new are persisted; the rest derive from persisted parents)."""

    next_frontier: DataFrame
    new: DataFrame
    results: DataFrame
    errors: DataFrame
    lineage: DataFrame
    n_selected: int
    next_count: int
    persisted: list


def _round_dataflow(
    spark: SparkSession,
    pages_path: str,
    robots: DataFrame | None,
    cfg: CrawlConfig,
    k: int,
    priority_base: int,
    frontier: DataFrame,
    seen_parts: list[DataFrame],
    shards: DataFrame | None,
    bloom_bcs: list,
    batch_deltas: list[DataFrame],
    truncate: bool = False,
    shard_bc=None,
    frontier_rows: int | None = None,
) -> _RoundFlow:
    """The per-depth dataflow for logical round k: politeness select →
    global FIFO rank → fetch join → link explode → admission → split.
    ``batch_deltas``: urls admitted by earlier depths of the SAME committed
    batch — exact anti-join parts (tiny, AQE-broadcast; they are not Bloom
    -covered, so they must not carry the maybe_seen condition).
    ``truncate``: materialize the combined admitted/deferred/retries frame
    via eager localCheckpoint instead of persist — REQUIRED when depths
    chain in memory (each depth's logical plan builds on the last; 16
    chained depths of un-truncated plan OOM the driver just *printing* the
    tree). Mid-batch fault tolerance is not lost: a crashed batch recomputes
    from the committed round. ``shard_bc``: pre-broadcast Bloom shard map
    shared across the batch's depths (bloom.broadcast_shard_map)."""
    # -- politeness selection (W3/T3) --------------------------------------
    flagged = select_round(frontier, robots, cfg.default_budget, cfg.n_salts,
                           delay_window_s=cfg.delay_window_s)
    selected = flagged.filter(F.col("selected")).drop("selected")
    deferred = flagged.filter(~F.col("selected")).drop("selected").select(*FRONTIER_COLS)

    # -- global FIFO rank (W1/W2) ------------------------------------------
    # JVM-only analytic rank over the full round set: one bucket-hash shuffle
    # (no range sampling, no Python round trip, no join-back). The committed
    # frontier count rides in as the size hint — tail depths take the
    # single-window small path (one fewer driver action per depth).
    ranked, n_selected, pinned = with_global_rank(
        selected, "priority", "fifo_rank", size_hint=frontier_rows
    )
    if n_selected == 0:
        pinned.unpersist()
        raise RuntimeError(
            f"round {k}: frontier non-empty but nothing selected — "
            "politeness budget must be ≥ 1 per active host"
        )

    # -- global per-round cap (T3, cfg.jar_limit): rows ranked past the cap
    # defer with priority intact; the rank is already global, so the cap is
    # one filter — no extra shuffle, no second ordering pass
    if cfg.jar_limit is not None and cfg.jar_limit < 1:
        raise ValueError(
            "jar_limit must be >= 1 — a cap of 0 defers every selected URL "
            "forever (no round can make progress)"
        )
    if cfg.jar_limit is not None and n_selected > cfg.jar_limit:
        deferred = deferred.unionByName(
            ranked.filter(F.col("fifo_rank") >= cfg.jar_limit).select(*FRONTIER_COLS)
        )
        ranked = ranked.filter(F.col("fifo_rank") < cfg.jar_limit)
        n_selected = cfg.jar_limit

    # -- fetch join (J2): huge pages scan ⋈ broadcast round set -------------
    # --dedup-content swaps in the batch-memoized UDF twins: same plan, same
    # outputs, each Arrow batch extracts once per distinct body (zero-shuffle;
    # the global groupBy(body_sha) variant, dedup_body_extract, measured
    # slower at every duplicate rate — bench `dedup_extract` micro).
    x_links = extract_links_memo if cfg.dedup_content else extract_links
    pages = spark.read.parquet(pages_path).select("url", "html")
    fetched = (
        pages.join(F.broadcast(ranked), "url", "inner")
        .withColumn("page_bytes", F.length("html").cast("long"))
        .withColumn("ext", x_links(F.col("html")))
        .drop("html")
        .persist()
    )

    # dead dir links: selected but absent from pages (404 analog). Failed
    # attempts requeue with retry_count+1 until cfg.max_retries (U4).
    failed = (
        ranked.join(F.broadcast(fetched.select("url")), "url", "left_anti")
        .persist()
    )
    # error ``details``: per-stage JSON context (reference error_log.details,
    # /root/reference/ddl/error_log.sql; to_json omits null fields)
    errors_dead = failed.select(
        F.lit(k).alias("round"), "url",
        F.lit("crawler").alias("stage"), F.lit("fetch_failed").alias("reason"),
        F.to_json(F.struct(
            (F.col("retry_count") + 1).alias("attempt"),
            "parent_url", "depth",
        )).alias("details"),
    )
    retries = (
        failed.filter(F.col("retry_count") < F.lit(cfg.max_retries))
        .withColumn("retry_count", F.col("retry_count") + 1)
        .select(*FRONTIER_COLS)
    )
    errors_parse = fetched.filter(F.col("ext.parse_failed")).select(
        F.lit(k).alias("round"), "url",
        F.lit("crawler").alias("stage"), F.lit("parse_failed").alias("reason"),
        F.to_json(F.struct("parent_url", "depth")).alias("details"),
    )

    # -- link explode + absolutize + priority arithmetic (P1/P3, core.py) ---
    links = fetched.select(
        F.col("url").alias("parent_url"),
        F.col("depth").alias("parent_depth"),
        F.col("fifo_rank"),
        F.posexplode(F.col("ext.links")).alias("discovery_idx", "link"),
    )
    child_url = F.concat(F.col("parent_url"), F.col("link.href"))
    if cfg.normalize_urls:
        from ..functions.urlnorm import normalize_url

        child_url = normalize_url(child_url)
    cand = links.select(
        child_url.alias("url"),
        (F.col("parent_depth") + 1).alias("depth"),
        (
            F.lit(priority_base)
            + F.col("fifo_rank") * F.lit(PRIORITY_STRIDE)
            + F.col("discovery_idx")
        ).alias("priority"),
        "parent_url",
        F.col("discovery_idx").cast("int"),
        F.col("link.is_dir").alias("is_dir"),
        F.col("link.ts_str").alias("ts_str"),
    ).withColumn("host", host_of(F.col("url")))

    cand = gate_robots(cand, robots)
    # probe → within-batch FIFO first-occurrence dedup → exact anti-joins;
    # dedup_first keeps the aggregate's url-partitioning visible to the
    # joins (one candidate shuffle total — see admit_new docstring)
    new0 = admit_new(
        cand, seen_parts, shards, cfg.bloom,
        broadcast_limit=cfg.bloom_broadcast_limit, track=bloom_bcs,
        dedup_first=True, shard_bc=shard_bc,
    )
    for d in batch_deltas:
        new0 = new0.join(d.select("url"), "url", "left_anti")

    # ONE materialization per depth: admitted ∪ deferred ∪ retries as a
    # single tagged frame. Rounds 1-5 checkpointed `new` and `next_frontier`
    # separately — two jobs per depth, and the next_frontier job re-ran the
    # politeness flag pass for `deferred` (flagged is not cached). The union
    # computes everything once; `new` and `next_frontier` are filters over
    # the cached/checkpointed result (no further jobs).
    new_cols = new0.columns
    nullb = F.lit(None).cast("boolean")
    nulls = F.lit(None).cast("string")
    combined = (
        new0.select(
            *FRONTIER_COLS[:-1],  # url..discovery_idx (retry_count synthesized)
            F.lit(0).alias("retry_count"), "is_dir", "ts_str",
            F.lit("n").alias("_tag"),
        )
        .unionByName(deferred.select(
            *FRONTIER_COLS, nullb.alias("is_dir"), nulls.alias("ts_str"),
            F.lit("d").alias("_tag")))
        .unionByName(retries.select(
            *FRONTIER_COLS, nullb.alias("is_dir"), nulls.alias("ts_str"),
            F.lit("r").alias("_tag")))
    )
    # (A lazy checkpoint folded into the next_count action measured a wash
    # against eager+count in interleaved A/B — kept eager for the simpler
    # materialization contract.)
    combined = combined.localCheckpoint(eager=True) if truncate else combined.persist()
    new = combined.filter(F.col("_tag") == "n").select(*new_cols)

    new_leaves = new.filter(~F.col("is_dir")).select(
        "url", "depth", "ts_str", "parent_url"
    )

    # -- leaf fetch + text extraction (downloader/extractor analog) ---------
    pages_full = spark.read.parquet(pages_path).select("url", "warc_ts", "html", "lang")
    leaf_pages = pages_full.join(F.broadcast(new_leaves), "url", "inner").persist()
    result_cols = [
        "url",
        "warc_ts",
        "text",
        "lang",
        "depth",
        F.lit(k).alias("round"),
        F.to_timestamp(F.col("ts_str"), LISTING_TS_SPARK_FORMAT).alias("publish_ts"),
    ]
    # --dedup-content: batch-memoized twin (leaf corpora are where
    # near-mirror duplication concentrates; same outputs, zero shuffle)
    x_text = extract_text_memo if cfg.dedup_content else extract_text
    results = leaf_pages.withColumn(
        "text", x_text(F.col("html"))
    ).select(*result_cols)
    errors_dead_leaf = (
        new_leaves.join(F.broadcast(leaf_pages.select("url")), "url", "left_anti")
        .select(
            F.lit(k).alias("round"), "url",
            F.lit("download").alias("stage"), F.lit("fetch_failed").alias("reason"),
            F.to_json(F.struct("parent_url", "depth")).alias("details"),
        )
    )

    # -- lineage (A1-A3): per-partition rows --------------------------------
    # urls_in counts scheduled URLs (incl. dead links); bytes only from
    # pages actually fetched. ONE tagged union + ONE aggregate: the
    # round-5 shape ran three separate groupBys (three Exchanges, ~5 AQE
    # stage-jobs per lineage write — the single most expensive write in the
    # round profile). spark_partition_id is evaluated in each branch's own
    # projection BEFORE the union, so rows keep their source partition ids;
    # per-(partition, source) rows are identical to the three-agg form.
    pid = F.spark_partition_id().alias("partition_id")
    zero = F.lit(0).cast("long")
    lin_src = (
        ranked.select(pid, F.lit("i").alias("_t"), zero.alias("page_bytes"))
        .unionByName(fetched.select(pid, F.lit("b").alias("_t"), "page_bytes"))
        .unionByName(new.select(pid, F.lit("o").alias("_t"),
                                zero.alias("page_bytes")))
    )
    lin_agg = lin_src.groupBy("partition_id", "_t").agg(
        F.count("*").alias("_n"), F.sum("page_bytes").alias("_b")
    )
    lineage = lin_agg.select(
        F.lit(cfg.run_id).alias("run_id"), F.lit(k).alias("round"),
        "partition_id",
        F.when(F.col("_t") == "i", F.col("_n")).otherwise(zero).alias("urls_in"),
        F.when(F.col("_t") == "o", F.col("_n")).otherwise(zero).alias("urls_out"),
        F.when(F.col("_t") == "b", F.col("_b")).otherwise(zero).alias("bytes_fetched"),
    )

    # next frontier = deferred ∪ admitted dirs ∪ retries — a filter over the
    # already-materialized combined frame, not a separate checkpoint
    next_frontier = combined.filter(
        (F.col("_tag") != "n") | F.coalesce(F.col("is_dir"), F.lit(False))
    ).select(*FRONTIER_COLS)
    next_count = next_frontier.count()
    persisted = [fetched, failed, leaf_pages, pinned]
    if not truncate:  # checkpointed frames free via ContextCleaner on GC
        persisted += [combined]
    return _RoundFlow(
        next_frontier=next_frontier,
        new=new,
        results=results,
        errors=errors_dead.unionByName(errors_parse).unionByName(errors_dead_leaf),
        lineage=lineage,
        n_selected=n_selected,
        next_count=next_count,
        persisted=persisted,
    )


def run_round(
    spark: SparkSession,
    store: RoundStore,
    pages_path: str,
    robots: DataFrame | None,
    cfg: CrawlConfig,
    k: int,
) -> RoundMeta:
    """Execute one committed transition starting at round k.

    Normally that is exactly one logical depth (commit round_{k+1}). With
    ``cfg.batch_threshold > 0`` and a frontier smaller than it, up to
    ``cfg.max_batch_rounds`` logical depths run back-to-back in memory and
    commit ONCE at round_{k+n} — same results/errors/lineage/priority
    arithmetic per logical round, one parquet round-trip and one commit for
    the whole batch. The batch stops early when the frontier empties, grows
    back over the threshold, or max_rounds is reached."""
    # a crashed prior attempt (or aborted update transition) may have left
    # stale artifacts at ANY index above k (batched commits stride) — sweep
    # them all; committing around stale state is never allowed
    store.clean_uncommitted_above(k)
    meta = store.meta(k)
    frontier = store.read_frontier(spark, k)
    seen_base = store.read_seen_base(spark, k)
    seen_deltas = store.read_seen_deltas(spark, k)
    seen_parts = [p for p in (seen_base, seen_deltas) if p is not None]
    shards, shards_rebuilt = validated_shards(spark, store, meta, cfg, k)
    bloom_bcs: list = []
    # ONE shard collect+broadcast per committed transition: every depth of a
    # batched round probes the same shard generation (new-in-batch urls are
    # handled by the exact batch_deltas anti-joins), so the per-depth driver
    # collect the round-5 shape paid was pure overhead.
    shard_bc = None
    if (
        shards is not None
        and cfg.bloom.n_buckets * cfg.bloom.shard_nbytes <= cfg.bloom_broadcast_limit
    ):
        from ..operators.bloom import broadcast_shard_map

        shard_bc = broadcast_shard_map(shards, track=bloom_bcs)

    batching = 0 < meta.frontier_count < cfg.batch_threshold
    max_inner = cfg.max_batch_rounds if batching else 1

    flows: list[_RoundFlow] = []
    domains = store.read_domains(spark, k)
    priority_base = meta.priority_base
    logical_k = k
    frontier_rows = meta.frontier_count
    while True:
        flow = _round_dataflow(
            spark, pages_path, robots, cfg, logical_k, priority_base,
            frontier, seen_parts, shards, bloom_bcs,
            batch_deltas=[f.new for f in flows],
            truncate=batching,
            shard_bc=shard_bc,
            frontier_rows=frontier_rows,
        )
        flows.append(flow)
        priority_base += flow.n_selected * PRIORITY_STRIDE
        logical_k += 1
        domains = _domains_step(domains, flow.next_frontier, logical_k)
        # batched mode chains one lazy full-outer join per inner depth onto
        # the domains frame; --batch-max is user-settable, and chained
        # iterative plans are this repo's documented driver-OOM pitfall —
        # truncate the lineage every few depths (tiny data: one row per host)
        if batching and len(flows) % 4 == 0:
            domains = domains.localCheckpoint(eager=True)
        frontier = flow.next_frontier
        frontier_rows = flow.next_count
        if (
            len(flows) >= max_inner
            or flow.next_count == 0
            or logical_k >= cfg.max_rounds
            or (batching and flow.next_count >= cfg.batch_threshold)
        ):
            break

    commit_k = logical_k
    all_new = flows[0].new
    for f in flows[1:]:
        all_new = all_new.unionByName(f.new)
    results = flows[0].results
    errors = flows[0].errors
    lineage = flows[0].lineage
    for f in flows[1:]:
        results = results.unionByName(f.results)
        errors = errors.unionByName(f.errors)
        lineage = lineage.unionByName(f.lineage)

    # The commit's artifacts are independent of each other and all derive
    # from persisted/checkpointed frames — write them CONCURRENTLY (guide
    # §2.6: actions are only sequential because the driver calls them
    # sequentially; a small pool lets each write's tail back-fill the idle
    # cores of the others). Profiled round 5: the seven sequential writes
    # were ~half of full_crawl's wall time, almost all of it per-job fixed
    # latency on KB-scale frames. Any failure propagates before commit, so
    # the crash-safety contract (commit marker last) is unchanged.
    writes: list[tuple[str, DataFrame]] = [
        ("frontier", flows[-1].next_frontier),
        ("seen_delta", _seen_delta(all_new)),
        ("results_delta", results),
        ("errors_delta", errors),
        ("lineage", lineage),
        ("domains", domains),
    ]
    if cfg.use_bloom:
        # LSM shards: per-round writes are DELTAS (O(new urls) bytes, not
        # O(total filter) — a 10^10-URL filter is tens of GB); a full merged
        # baseline is re-materialized only at compaction cadence or after a
        # spec-change rebuild.
        delta = build_shards(all_new, cfg.bloom)
        last_full = store.last_full_shards_round(k)
        full_due = (
            shards_rebuilt or shards is None
            or commit_k % cfg.compact_every == 0
            # batched commits stride past the modulus rounds — re-baseline
            # by distance so the delta chain stays bounded
            or commit_k - (last_full if last_full is not None else 0) >= cfg.compact_every
        )
        if full_due:
            shards_next = merge_shards(shards, delta) if shards is not None else delta
            writes.append(("shards", shards_next))
        else:
            writes.append(("shards_delta", delta))

    from concurrent.futures import ThreadPoolExecutor

    # one thread per artifact: the writes are KB-scale latency-bound jobs
    # (guide §2.6 recommends 2-3 in flight for big jobs; these are tiny and
    # the cluster-side work still queues through the scheduler) — measured
    # 24.6 → 21.5-22.4 s full_crawl vs a 4-wide pool
    with ThreadPoolExecutor(max_workers=len(writes)) as pool:
        list(pool.map(lambda nd: store.write(commit_k, nd[0], nd[1]), writes))

    next_meta = RoundMeta(
        round=commit_k,
        priority_base=priority_base,
        frontier_count=flows[-1].next_count,
        seen_buckets=cfg.seen_buckets,
        **_meta_bloom(cfg),
    )
    store.commit(commit_k, next_meta)

    for f in flows:
        for df in f.persisted:
            df.unpersist()
    for bc in bloom_bcs:
        bc.destroy()
    return next_meta
