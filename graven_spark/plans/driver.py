"""Iterative crawl driver: the round loop, seeding, resume, re-process
modes, and output handles (SURVEY.md §3.1-3.3).

The loop condition is frontier-emptiness, exactly the reference's
empty-queue protocol (/root/reference/graven/worker/crawler.py:130-163);
resume = continue from the highest committed round (the reference's analog:
status-reset re-claim, /root/reference/graven/db/graven_database.py:159-165,
/root/reference/graven/worker/worker.py:56-58). A killed in-flight round is
simply re-run — every round write is idempotent (mode=overwrite) and the
commit marker is written last, so replay cannot double-count.

Re-process modes (applied as one extra committed round transition on resume):
- ``cfg.update_domains`` — the reference's ``--update-domain`` re-open of
  COMPLETED domains (/root/reference/graven/worker/crawler.py:172-184,
  graven_database.py:103-115): purge the hosts' URLs from the seen set
  (materialized as a fresh bucketed seen_full — the LSM makes deletion a
  compaction, not an in-place mutation), rebuild the Bloom shards from the
  purged set, re-seed the hosts' roots, stamp the domains IN_PROGRESS.
- ``cfg.update_url_prefix`` — the reference's ``--update-jar`` re-process
  of already-seen artifacts (crawler.py:141-170): re-fetch + re-extract
  every recorded result url under the prefix; the store's results reader
  keeps only the newest round's row per url.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.canon import canonicalize, host_of
from ..functions.extract import extract_text
from ..operators.bloom import build_shards
from ..sources.checkpoint import RoundMeta, RoundStore
from .frontier import FRONTIER_COLS, CrawlConfig, _meta_bloom, init_run, run_round


@dataclass
class CrawlOutputs:
    store: RoundStore
    final_round: int  # index of the last committed state dir

    def seen(self, spark: SparkSession) -> DataFrame:
        return self.store.read_seen(spark, self.final_round)

    def results(self, spark: SparkSession) -> DataFrame:
        return self.store.read_results(spark, self.final_round)

    def errors(self, spark: SparkSession) -> DataFrame:
        return self.store.read_errors(spark, self.final_round)

    def lineage(self, spark: SparkSession) -> DataFrame:
        return self.store.read_lineage(spark, self.final_round)

    def domains(self, spark: SparkSession) -> DataFrame:
        return self.store.read_domains(spark, self.final_round)

    def frontier(self, spark: SparkSession, k: int) -> DataFrame:
        return self.store.read_frontier(spark, k)

    def run_log(self, spark: SparkSession) -> DataFrame:
        return self.store.read_run_log(spark)


def _reopen_domains(
    spark: SparkSession,
    store: RoundStore,
    k: int,
    seeds: DataFrame,
    robots: DataFrame | None,
    cfg: CrawlConfig,
) -> RoundMeta:
    """One committed round transition k → k+1 that re-opens
    ``cfg.update_domains``: purged seen base + rebuilt shards + re-seeded
    roots + IN_PROGRESS domain stamps. Re-seeding applies the same robots
    gate and first-occurrence dedup as init_run — a blocked or duplicated
    seed must not slip in through the update path.

    The host set is a DATAFRAME join, never a collected list / IN-literal:
    ``update_domains == "*"`` (the ``-u`` flag) reads the recorded domains
    table; an explicit ``--update-domain`` list becomes a tiny broadcast
    frame. Either way the seen purge is an anti-join — at a multi-million-
    host 100× crawl neither the driver memory nor the plan size grows with
    the host count."""
    from ..operators.dedup import first_occurrence
    from ..operators.politeness import gate_robots

    meta = store.meta(k)
    store.clean_uncommitted_above(k)
    if cfg.update_domains == "*":
        # every recorded host (reference cli_parser.py:66-71 -u semantics);
        # host cardinality ~ domains table — AQE picks the join strategy
        hosts_df = store.read_domains(spark, k).select("host")
    elif isinstance(cfg.update_domains, str):
        # any other bare string would iterate per CHARACTER below,
        # silently matching no host and no-opping the update
        raise ValueError(
            f"update_domains must be a list of hosts or '*', got the "
            f"string {cfg.update_domains!r}"
        )
    else:
        hosts_df = F.broadcast(
            spark.createDataFrame(
                [(h,) for h in cfg.update_domains], "host string"
            )
        )
    reseed = (
        seeds.select(
            canonicalize(F.col("url")).alias("url"),
            F.col("seed_rank").cast("long").alias("priority"),
        )
        .withColumn("host", host_of(F.col("url")))
        .join(hosts_df, "host", "left_semi")
        .withColumn("depth", F.lit(0))
        .withColumn("parent_url", F.lit(None).cast("string"))
        .withColumn("discovery_idx", F.col("priority").cast("int"))
        .withColumn("retry_count", F.lit(0))
    )
    reseed = first_occurrence(gate_robots(reseed, robots)).select(*FRONTIER_COLS)
    purged = (
        store.read_seen(spark, k)
        .withColumn("host", host_of(F.col("url")))
        .join(hosts_df, "host", "left_anti")
        .drop("host")
    )
    from .frontier import _seen_delta

    seen_next = purged.unionByName(_seen_delta(reseed))
    next_frontier = store.read_frontier(spark, k).unionByName(reseed)
    store.write(k + 1, "frontier", next_frontier)
    store.mark_updated()  # the re-crawl re-emits result rows for purged urls
    store.write_seen_full(spark, k + 1, seen_next)
    if cfg.use_bloom:
        store.write(k + 1, "shards", build_shards(store.read_seen(spark, k + 1), cfg.bloom))
    # Stamp IN_PROGRESS for every host that actually got frontier rows at
    # k+1 — full-outer against the prior table so an update host with a seed
    # but NO prior domain row gets its IN_PROGRESS/start_round=k+1 row
    # immediately (not one round late via _domains_step at k+2).
    reopened = reseed.select("host").distinct().withColumn("_re", F.lit(True))
    j = store.read_domains(spark, k).join(reopened, "host", "full")
    is_re = F.coalesce(F.col("_re"), F.lit(False))
    domains = j.select(
        "host",
        F.when(is_re, F.lit("IN_PROGRESS")).otherwise(F.col("status")).alias("status"),
        F.when(is_re, F.lit(k + 1)).otherwise(F.col("start_round")).alias("start_round"),
        F.when(is_re, F.lit(None).cast("int"))
        .otherwise(F.col("end_round")).alias("end_round"),
    )
    store.write(k + 1, "domains", domains)
    next_meta = RoundMeta(
        round=k + 1,
        priority_base=meta.priority_base,
        frontier_count=next_frontier.count(),
        seen_buckets=cfg.seen_buckets,
        seen_bucketed=True,  # write_seen_full ran pre-commit
        **_meta_bloom(cfg),
    )
    store.commit(k + 1, next_meta)
    return next_meta


def _update_urls(
    spark: SparkSession,
    store: RoundStore,
    k: int,
    pages_path: str,
    cfg: CrawlConfig,
) -> RoundMeta:
    """One committed round transition k → k+1 re-processing every recorded
    result url under ``cfg.update_url_prefix`` (re-fetch + re-extract; the
    url's depth/publish_ts are carried from the prior row, round is
    re-stamped — read_results keeps the newest row per url)."""
    meta = store.meta(k)
    store.clean_uncommitted_above(k)
    targets = (
        store.read_results(spark, k)
        .filter(F.col("url").startswith(cfg.update_url_prefix))
        .select("url", "depth", "publish_ts")
    )
    # no broadcast hint: the prefix can match an unbounded share of results
    # (unlike the budget-bounded round sets) — AQE broadcasts iff small
    pages = spark.read.parquet(pages_path).select(
        "url", "warc_ts", "html", "lang"
    ).withColumn("_hit", F.lit(True))
    joined = targets.join(pages, "url", "left")
    refreshed = joined.filter(F.col("_hit").isNotNull()).select(
        "url",
        "warc_ts",
        extract_text(F.col("html")).alias("text"),
        "lang",
        "depth",
        F.lit(k + 1).alias("round"),
        "publish_ts",
    )
    # a recorded result url gone from pages re-fetches as a failure: log it
    # (the reference logs re-fetch failures too, crawler.py:119-125) instead
    # of silently keeping the stale result row without trace
    refetch_failed = joined.filter(F.col("_hit").isNull()).select(
        F.lit(k + 1).alias("round"), "url",
        F.lit("crawler").alias("stage"), F.lit("fetch_failed").alias("reason"),
        F.to_json(F.struct(
            F.lit("update_jar").alias("stage_ctx"),
            F.lit(cfg.update_url_prefix).alias("prefix"),
        )).alias("details"),
    )
    frontier = store.read_frontier(spark, k)
    store.write(k + 1, "frontier", frontier)
    store.write(k + 1, "results_delta", refreshed)
    store.write(k + 1, "errors_delta", refetch_failed)
    store.mark_updated()
    store.write(k + 1, "domains", store.read_domains(spark, k))
    shards = store.read_shards(spark, k)
    if shards is not None:
        store.write(k + 1, "shards", shards)
    next_meta = RoundMeta(
        round=k + 1,
        priority_base=meta.priority_base,
        frontier_count=meta.frontier_count,
        seen_buckets=cfg.seen_buckets,
        **_meta_bloom(cfg),
    )
    store.commit(k + 1, next_meta)
    return next_meta


def crawl(
    spark: SparkSession,
    pages_path: str,
    seeds: DataFrame,
    robots: DataFrame | None,
    state_dir: str,
    cfg: CrawlConfig | None = None,
    tool_meta: dict | None = None,
) -> CrawlOutputs:
    """Run (or resume) a crawl to completion; returns output handles.
    ``tool_meta``: run_log scanner-metadata columns (syft_version /
    grype_version / grype_db_source, /root/reference/ddl/0_run_log.sql)."""
    cfg = cfg or CrawlConfig()
    if isinstance(cfg.update_domains, str) and cfg.update_domains != "*":
        # fail at entry, not rounds later inside _reopen_domains: a bare
        # host string would otherwise iterate per character there
        raise ValueError(
            f"update_domains must be a list of hosts or '*', got the "
            f"string {cfg.update_domains!r}"
        )
    store = RoundStore(state_dir, compact_every=cfg.compact_every,
                       seen_buckets=cfg.seen_buckets)

    k = store.latest_round()
    if k is None:
        meta = init_run(spark, store, seeds, robots, cfg)
        k = 0
    else:
        meta = store.meta(k)
        if cfg.update_domains:
            meta = _reopen_domains(spark, store, k, seeds, robots, cfg)
            k = meta.round
        if cfg.update_url_prefix is not None:  # "" = every url (--update)
            meta = _update_urls(spark, store, k, pages_path, cfg)
            k = meta.round

    # run_log bracket (reference log_run_start/log_run_end,
    # graven_database.py:353-377): opening also closes any dangling prior
    # run as KILLED — the crash-safe analog of the reference's UPDATE.
    seq = store.log_run_start(cfg.run_id, k, tool_meta=tool_meta)
    while meta.frontier_count > 0 and meta.round < cfg.max_rounds:
        meta = run_round(spark, store, pages_path, robots, cfg, meta.round)
        store.maybe_compact_seen(spark, meta.round)
        k = meta.round
    store.log_run_end(seq, k)
    return CrawlOutputs(store=store, final_round=k)
