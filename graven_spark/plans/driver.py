"""Iterative crawl driver: the round loop, seeding, resume, and output
handles (SURVEY.md §3.1-3.3).

The loop condition is frontier-emptiness, exactly the reference's
empty-queue protocol (/root/reference/graven/worker/crawler.py:130-163);
resume = continue from the highest committed round (the reference's analog:
status-reset re-claim, /root/reference/graven/db/graven_database.py:159-165,
/root/reference/graven/worker/worker.py:56-58). A killed in-flight round is
simply re-run — every round write is idempotent (mode=overwrite) and the
commit marker is written last, so replay cannot double-count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..sources.checkpoint import RoundStore
from .frontier import CrawlConfig, init_run, run_round


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

    def frontier(self, spark: SparkSession, k: int) -> DataFrame:
        return self.store.read_frontier(spark, k)


def crawl(
    spark: SparkSession,
    pages_path: str,
    seeds: DataFrame,
    robots: DataFrame | None,
    state_dir: str,
    cfg: CrawlConfig | None = None,
) -> CrawlOutputs:
    """Run (or resume) a crawl to completion; returns output handles."""
    cfg = cfg or CrawlConfig()
    store = RoundStore(state_dir, compact_every=cfg.compact_every)

    k = store.latest_round()
    if k is None:
        meta = init_run(spark, store, seeds, robots, cfg)
        k = 0
    else:
        meta = store.meta(k)

    while meta.frontier_count > 0 and meta.round < cfg.max_rounds:
        meta = run_round(spark, store, pages_path, robots, cfg, meta.round)
        store.maybe_compact_seen(spark, meta.round)
        k = meta.round
    return CrawlOutputs(store=store, final_round=k)
