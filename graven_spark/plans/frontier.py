"""One crawl round as a single declarative Spark job (SURVEY.md §3.1):

    frontier_k → politeness select (token buckets) → global FIFO rank
      → fetch join against pages (broadcast the budget-bounded round set)
      → extract links (Arrow UDF) → absolutize → batch dedup (first
        occurrence) → robots gate → Bloom-prefiltered anti-join vs seen
      → split: dirs → frontier_{k+1} ∪ deferred ; leaves → fetch join →
        extract text (Arrow UDF) → results
      → seen MERGE (append delta), lineage rows, shard update, atomic commit.

This replaces the reference's six-thread claim-check pipeline
(/root/reference/graven/worker/pipeline_builder.py:124-224) with
deterministic round membership — no mutable claim state at all.

Scale notes (explicitly engineered, SURVEY.md §4.2):
- the round fetch set is budget-bounded ⇒ it is always the broadcast side of
  the joins against the huge ``pages`` table and against its own derived
  url lists (dead-link detection);
- candidate dedup/admission shuffles hash on url (pmod(xxhash64)) — the salt
  that kills host skew, since one host's URLs spread uniformly;
- ``seen`` is only ever read with column pruning (url) and only probed by the
  bloom-positive slice;
- per-round parquet round-trip keeps the iterative plan O(1) per round.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import LISTING_TS_SPARK_FORMAT, PRIORITY_STRIDE, SEED_PRIORITY_BASE
from ..functions.canon import canonicalize, host_of, url_hash
from ..functions.extract import extract_links, extract_text
from ..operators.bloom import BloomSpec, build_shards, merge_shards
from ..operators.dedup import admit_new, first_occurrence
from ..operators.politeness import DEFAULT_BUDGET, gate_robots, select_round
from ..operators.ranking import with_global_rank
from ..sources.checkpoint import RoundMeta, RoundStore

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


def _seen_delta(new_urls: DataFrame) -> DataFrame:
    return new_urls.select(
        url_hash(F.col("url")).alias("url_hash"), "url"
    )


def init_run(
    spark: SparkSession,
    store: RoundStore,
    seeds: DataFrame,
    robots: DataFrame | None,
    cfg: CrawlConfig,
) -> RoundMeta:
    """Seed admission → round 0 state (reference: crawler.py:189-203; seed
    file order is the inter-root priority, cli_parser.py:246-259)."""
    cand = (
        seeds.select(
            canonicalize(F.col("url")).alias("url"),
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
    if cfg.use_bloom:
        store.write(0, "shards", build_shards(frontier0, cfg.bloom))
    meta = RoundMeta(
        round=0,
        priority_base=SEED_PRIORITY_BASE,
        frontier_count=frontier0.count(),
    )
    store.commit(0, meta)
    return meta


def run_round(
    spark: SparkSession,
    store: RoundStore,
    pages_path: str,
    robots: DataFrame | None,
    cfg: CrawlConfig,
    k: int,
) -> RoundMeta:
    """Execute round k (state in round_k/) and commit round_{k+1}/."""
    meta = store.meta(k)
    frontier = store.read_frontier(spark, k)
    seen = store.read_seen(spark, k)
    shards = store.read_shards(spark, k) if cfg.use_bloom else None

    # -- politeness selection (W3/T3) --------------------------------------
    flagged = select_round(frontier, robots, cfg.default_budget, cfg.n_salts)
    selected = flagged.filter(F.col("selected")).drop("selected")
    deferred = flagged.filter(~F.col("selected")).drop("selected").select(*FRONTIER_COLS)

    # -- global FIFO rank (W1/W2) ------------------------------------------
    # JVM-only analytic rank over the full round set: one bucket-hash shuffle
    # (no range sampling, no Python round trip, no join-back).
    ranked, n_selected = with_global_rank(selected, "priority", "fifo_rank")
    if n_selected == 0:
        raise RuntimeError(
            f"round {k}: frontier non-empty but nothing selected — "
            "politeness budget must be ≥ 1 per active host"
        )

    # -- fetch join (J2): huge pages scan ⋈ broadcast round set -------------
    pages = spark.read.parquet(pages_path).select("url", "html")
    fetched = (
        pages.join(F.broadcast(ranked), "url", "inner")
        .withColumn("page_bytes", F.length("html").cast("long"))
        .withColumn("ext", extract_links(F.col("html")))
        .drop("html")
        .persist()
    )

    # dead dir links: selected but absent from pages (404 analog)
    errors_dead = (
        ranked.join(F.broadcast(fetched.select("url")), "url", "left_anti")
        .select(
            F.lit(k).alias("round"), "url",
            F.lit("crawler").alias("stage"), F.lit("fetch_failed").alias("reason"),
        )
    )
    errors_parse = fetched.filter(F.col("ext.parse_failed")).select(
        F.lit(k).alias("round"), "url",
        F.lit("crawler").alias("stage"), F.lit("parse_failed").alias("reason"),
    )

    # -- link explode + absolutize + priority arithmetic (P1/P3, core.py) ---
    links = fetched.select(
        F.col("url").alias("parent_url"),
        F.col("depth").alias("parent_depth"),
        F.col("fifo_rank"),
        F.posexplode(F.col("ext.links")).alias("discovery_idx", "link"),
    )
    cand = links.select(
        F.concat(F.col("parent_url"), F.col("link.href")).alias("url"),
        (F.col("parent_depth") + 1).alias("depth"),
        (
            F.lit(meta.priority_base)
            + F.col("fifo_rank") * F.lit(PRIORITY_STRIDE)
            + F.col("discovery_idx")
        ).alias("priority"),
        "parent_url",
        F.col("discovery_idx").cast("int"),
        F.col("link.is_dir").alias("is_dir"),
        F.col("link.ts_str").alias("ts_str"),
    ).withColumn("host", host_of(F.col("url")))

    cand = gate_robots(cand, robots)
    cand = first_occurrence(cand)  # within-batch FIFO first-occurrence dedup
    new = admit_new(cand, seen, shards, cfg.bloom).persist()

    new_dirs = (
        new.filter(F.col("is_dir"))
        .withColumn("retry_count", F.lit(0))
        .select(*FRONTIER_COLS)
    )
    new_leaves = new.filter(~F.col("is_dir")).select("url", "depth", "ts_str")

    # -- leaf fetch + text extraction (downloader/extractor analog) ---------
    pages_full = spark.read.parquet(pages_path).select("url", "warc_ts", "html", "lang")
    leaf_pages = pages_full.join(F.broadcast(new_leaves), "url", "inner").persist()
    results = leaf_pages.select(
        "url",
        "warc_ts",
        extract_text(F.col("html")).alias("text"),
        "lang",
        "depth",
        F.lit(k).alias("round"),
        F.to_timestamp(F.col("ts_str"), LISTING_TS_SPARK_FORMAT).alias("publish_ts"),
    )
    errors_dead_leaf = (
        new_leaves.join(F.broadcast(leaf_pages.select("url")), "url", "left_anti")
        .select(
            F.lit(k).alias("round"), "url",
            F.lit("download").alias("stage"), F.lit("fetch_failed").alias("reason"),
        )
    )

    # -- lineage (A1-A3): per-partition rows --------------------------------
    # urls_in counts scheduled URLs (incl. dead links); bytes only from
    # pages actually fetched.
    lin_in = ranked.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count("*").alias("urls_in")
    ).withColumn("urls_out", F.lit(0).cast("long")).withColumn(
        "bytes_fetched", F.lit(0).cast("long")
    )
    lin_bytes = fetched.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.sum("page_bytes").alias("bytes_fetched")
    ).withColumn("urls_in", F.lit(0).cast("long")).withColumn(
        "urls_out", F.lit(0).cast("long")
    )
    lin_out = new.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count("*").alias("urls_out")
    ).withColumn("urls_in", F.lit(0).cast("long")).withColumn(
        "bytes_fetched", F.lit(0).cast("long")
    )
    lineage = (
        lin_in.unionByName(lin_bytes.select(*lin_in.columns))
        .unionByName(lin_out.select(*lin_in.columns))
        .select(
            F.lit(cfg.run_id).alias("run_id"), F.lit(k).alias("round"),
            "partition_id", "urls_in", "urls_out", "bytes_fetched",
        )
    )

    # -- write round k+1 -----------------------------------------------------
    next_frontier = deferred.unionByName(new_dirs).persist()
    next_count = next_frontier.count()
    store.write(k + 1, "frontier", next_frontier)
    store.write(k + 1, "seen_delta", _seen_delta(new))
    store.write(k + 1, "results_delta", results)
    store.write(
        k + 1, "errors_delta",
        errors_dead.unionByName(errors_parse).unionByName(errors_dead_leaf),
    )
    store.write(k + 1, "lineage", lineage)
    if cfg.use_bloom:
        delta = build_shards(new, cfg.bloom)
        shards_next = merge_shards(shards, delta) if shards is not None else delta
        store.write(k + 1, "shards", shards_next)

    next_meta = RoundMeta(
        round=k + 1,
        priority_base=meta.priority_base + n_selected * PRIORITY_STRIDE,
        frontier_count=next_count,
    )
    store.commit(k + 1, next_meta)

    for df in (fetched, new, leaf_pages, next_frontier):
        df.unpersist()
    return next_meta
