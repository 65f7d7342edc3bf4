"""Checkpoint/resume semantics (SURVEY.md §5.3; north_rule: "a killed job
resumes mid-crawl with identical downstream ordering"). Mirrors the
reference's status-reset re-claim resume
(/root/reference/graven/db/graven_database.py:159-165)."""

from __future__ import annotations

import os
import shutil

from graven_spark.plans.driver import crawl
from graven_spark.plans.frontier import CrawlConfig
from graven_spark.operators.bloom import BloomSpec

from .conftest import pages_dict, robots_dict  # noqa: F401


def _cfg(max_rounds: int = 1000) -> CrawlConfig:
    return CrawlConfig(
        use_bloom=True,
        bloom=BloomSpec(n_buckets=4, bits_per_shard=1 << 16),
        max_rounds=max_rounds,
        compact_every=3,  # force a compaction mid-run
    )


def _collect(spark, out):
    seen = sorted(r.url for r in out.seen(spark).collect())
    res = sorted(
        (r.url, r.text, r.depth, r.round) for r in out.results(spark).collect()
    )
    return seen, res


def test_kill_and_resume_identical(spark, smoke_graph, tmp_path):
    pages_path = str(tmp_path / "pages.parquet")
    smoke_graph.pages.to_parquet(pages_path, index=False)
    seeds = spark.createDataFrame(smoke_graph.seeds)
    robots = spark.createDataFrame(
        smoke_graph.robots,
        schema="host string, disallow_prefixes array<string>, crawl_delay_tokens int",
    )

    # uninterrupted reference run
    full = crawl(spark, pages_path, seeds, robots, str(tmp_path / "full"), _cfg())

    # interrupted: stop after 2 rounds ("kill"), then resume
    part_dir = str(tmp_path / "part")
    crawl(spark, pages_path, seeds, robots, part_dir, _cfg(max_rounds=2))
    # simulate a mid-round crash artifact: an uncommitted partial round dir
    junk = os.path.join(part_dir, f"round_{3:06d}")
    os.makedirs(os.path.join(junk, "frontier"), exist_ok=True)
    resumed = crawl(spark, pages_path, seeds, robots, part_dir, _cfg())

    assert resumed.final_round == full.final_round
    assert _collect(spark, resumed) == _collect(spark, full)

    # the junk dir was overwritten by the committed real round 3
    assert os.path.exists(os.path.join(junk, "_COMMIT"))
    shutil.rmtree(junk, ignore_errors=True)
