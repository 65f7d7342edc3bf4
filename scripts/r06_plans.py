"""Dump .explain('formatted') plans for the round-6 optimization evidence
(plans/r06/<name>_{before,after}.txt).

Usage: python scripts/r06_plans.py <tag>      # tag = before | after
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", "r06")


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def dump(name: str, tag: str, df) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(formatted(df))
    print(f"wrote {path}")


def schedule_round_df(spark, bench):
    """The bench's schedule_job dataflow (same code path, stopping before
    the count action) against the bucketed t32 tables."""
    from graven_spark.functions.canon import host_of, url_hash
    from graven_spark.functions.extract import extract_links
    from graven_spark.operators.dedup import admit_new
    from graven_spark.operators.politeness import select_round
    from graven_spark.operators.ranking import with_global_rank

    wh = bench.ensure_scale_tables(int(os.environ.get("SPARK_GRAFT_SCALE_TIMES", "32")))
    pages = spark.table("pages_b")
    frontier = (
        pages.select("url")
        .filter(F.col("url").endswith("/"))
        .select(
            "url", host_of(F.col("url")).alias("host"), F.lit(0).alias("depth"),
            url_hash(F.col("url")).alias("priority"),
            F.lit(None).cast("string").alias("parent_url"),
            F.lit(0).alias("discovery_idx"), F.lit(0).alias("retry_count"),
        )
    )
    import pandas as pd
    robots_pd = pd.read_parquet(os.path.join(bench.SCALE_CACHE_DIR, "robots.parquet"))
    robots = spark.createDataFrame(
        robots_pd,
        schema="host string, disallow_prefixes array<string>, crawl_delay_tokens int",
    )
    flagged = select_round(frontier, robots)
    selected = flagged.filter(F.col("selected")).drop("selected")
    ranked, _, pinned = with_global_rank(selected, "priority", "fifo_rank")
    fetched = (
        spark.table("pages_b").select("url", "html")
        .join(ranked.hint("shuffle_hash"), "url", "inner")
        .withColumn("ext", extract_links(F.col("html")))
        .drop("html")
    )
    links = fetched.select(
        F.col("url").alias("parent_url"), F.col("fifo_rank"),
        F.posexplode(F.col("ext.links")).alias("discovery_idx", "link"),
    )
    cand = links.select(
        F.concat(F.col("parent_url"), F.col("link.href")).alias("url"),
        (F.col("fifo_rank") * (1 << 20) + F.col("discovery_idx")).alias("priority"),
        F.col("link.is_dir").alias("is_dir"),
    ).withColumn("host", host_of(F.col("url")))
    seen = spark.table("seen_b")
    shards = spark.read.parquet(os.path.join(wh, "shards"))
    new = admit_new(cand, seen, shards, bench.BLOOM, dedup_first=True)
    return new, pinned


def crawl_round_df(spark):
    """One committed crawl-round's `new` admission plan on the mini graph
    (captured by intercepting admit_new inside run_round)."""
    from graven_spark.operators import dedup as dedup_mod
    from graven_spark.plans import frontier as frontier_mod
    from graven_spark.plans.driver import crawl
    from graven_spark.plans.frontier import CrawlConfig
    from graven_spark.operators.bloom import BloomSpec
    from graven_spark.sources import synth

    captured = []
    orig = dedup_mod.admit_new

    def spy(*a, **kw):
        out = orig(*a, **kw)
        captured.append(out)
        return out

    frontier_mod.admit_new = spy
    try:
        graph = synth.generate_graph(synth.mini_specs())
        tmp = tempfile.mkdtemp(prefix="r06_plans_")
        pages_path = os.path.join(tmp, "pages.parquet")
        graph.pages.to_parquet(pages_path, index=False)
        seeds = spark.createDataFrame(graph.seeds)
        robots = spark.createDataFrame(
            graph.robots,
            schema="host string, disallow_prefixes array<string>, crawl_delay_tokens int",
        )
        cfg = CrawlConfig(use_bloom=True,
                          bloom=BloomSpec(n_buckets=8, bits_per_shard=1 << 16))
        crawl(spark, pages_path, seeds, robots, os.path.join(tmp, "state"), cfg)
    finally:
        frontier_mod.admit_new = orig
    return captured[0]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    import bench
    spark = bench.scale_session(
        "local[32]",
        bench.ensure_scale_tables(int(os.environ.get("SPARK_GRAFT_SCALE_TIMES", "32"))),
        f"plans_{tag}",
    )
    new, pinned = schedule_round_df(spark, bench)
    dump("schedule_round", tag, new)
    pinned.unpersist()
    dump("full_crawl_round_new", tag, crawl_round_df(spark))
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    sf = "/root/testdata/sf0.1"
    for name in ("dedup_minhash_lsh", "dedup_exact", "lineage_rollup",
                 "fetch_join_broadcast", "token_count", "quality_score",
                 "politeness_topk", "embed_cosine_topk", "dedup_embed_cosine"):
        dump(name, tag, qs[name](spark, sf))
    spark.stop()


if __name__ == "__main__":
    main()
