"""The replay contract (SURVEY.md §5.1, BASELINE.json north_rule): the Spark
engine must reproduce the single-threaded reference oracle exactly —
round-by-round frontier contents + priority order, final URL-seen set,
results (with byte-identical extracted text), errors, and lineage totals —
under the same seed list and politeness budget.
"""

from __future__ import annotations

import pandas as pd
import pytest

from graven_spark.oracle import crawl_oracle
from graven_spark.plans.driver import crawl
from graven_spark.plans.frontier import CrawlConfig
from graven_spark.operators.bloom import BloomSpec

from .conftest import pages_dict, robots_dict

FRONTIER_KEY = ["priority", "url", "host", "depth", "parent_url", "discovery_idx"]


def _setup(tmp_path, graph, with_robots: bool):
    tmp_path.mkdir(parents=True, exist_ok=True)
    pages_path = str(tmp_path / "pages.parquet")
    graph.pages.to_parquet(pages_path, index=False)
    robots_pd = graph.robots if with_robots else None
    return pages_path, robots_pd


def _spark_inputs(spark, graph, robots_pd):
    seeds = spark.createDataFrame(graph.seeds)
    robots = (
        spark.createDataFrame(
            robots_pd, schema="host string, disallow_prefixes array<string>, crawl_delay_tokens int"
        )
        if robots_pd is not None
        else None
    )
    return seeds, robots


def _run_both(spark, tmp_path, graph, with_robots: bool, cfg: CrawlConfig):
    pages_path, robots_pd = _setup(tmp_path, graph, with_robots)
    seeds, robots = _spark_inputs(spark, graph, robots_pd)
    out = crawl(spark, pages_path, seeds, robots, str(tmp_path / "state"), cfg)
    ora = crawl_oracle(
        pages_dict(graph.pages),
        list(graph.seeds.sort_values("seed_rank")["url"]),
        robots_dict(robots_pd) if robots_pd is not None else None,
        jar_limit=cfg.jar_limit,
    )
    return out, ora


def _assert_match(spark, out, ora):
    # final round count: oracle snapshots = number of executed rounds
    assert out.final_round == len(ora.frontier_snapshots)

    # per-round frontier contents + priority order
    for k, snap in enumerate(ora.frontier_snapshots):
        got = (
            out.frontier(spark, k)
            .orderBy("priority")
            .select(*FRONTIER_KEY)
            .collect()
        )
        want = [
            (r.priority, r.url, r.host, r.depth, r.parent_url, r.discovery_idx)
            for r in snap
        ]
        assert [tuple(r) for r in got] == want, f"frontier mismatch at round {k}"

    # URL-seen set
    got_seen = {r.url for r in out.seen(spark).select("url").collect()}
    assert got_seen == ora.seen

    # results incl. byte-identical text and publish_ts
    got_res = {
        r.url: (r.warc_ts, r.text, r.lang, r.depth, r.round, r.publish_ts)
        for r in out.results(spark).collect()
    }
    want_res = {
        r["url"]: (r["warc_ts"], r["text"], r["lang"], r["depth"], r["round"], r["publish_ts"])
        for r in ora.results
    }
    assert got_res == want_res

    # errors as multisets, incl. the JSON details context
    got_err = sorted(
        (r.round, r.url, r.stage, r.reason, r.details)
        for r in out.errors(spark).collect()
    )
    want_err = sorted(
        (e["round"], e["url"], e["stage"], e["reason"], e["details"])
        for e in ora.errors
    )
    assert got_err == want_err

    # lineage: per-round totals
    lin = (
        out.lineage(spark)
        .groupBy("round")
        .sum("urls_in", "urls_out", "bytes_fetched")
        .collect()
    )
    got_lin = {r["round"]: tuple(r)[1:] for r in lin}
    want_lin = {
        l["round"]: (l["urls_in"], l["urls_out"], l["bytes_fetched"]) for l in ora.lineage
    }
    assert got_lin == want_lin


def test_replay_smoke_unbounded(spark, smoke_graph, tmp_path):
    """No politeness budget: pure BFS, rounds = depth levels."""
    cfg = CrawlConfig(use_bloom=True, bloom=BloomSpec(n_buckets=8, bits_per_shard=1 << 16))
    out, ora = _run_both(spark, tmp_path, smoke_graph, with_robots=False, cfg=cfg)
    _assert_match(spark, out, ora)
    assert len(ora.results) > 50  # sanity: the graph actually has leaves


def test_replay_smoke_budgeted_with_robots(spark, smoke_graph, tmp_path):
    """Politeness budget (5/host/round) + robots gating: deferral order must
    match the oracle's FIFO exactly across many more rounds."""
    cfg = CrawlConfig(use_bloom=True, bloom=BloomSpec(n_buckets=8, bits_per_shard=1 << 16))
    out, ora = _run_both(spark, tmp_path, smoke_graph, with_robots=True, cfg=cfg)
    assert out.final_round > 3  # budget actually forced deferrals
    _assert_match(spark, out, ora)


def test_replay_jar_limit_global_cap(spark, smoke_graph, tmp_path):
    """T3 --jar-limit (reference downloader.py:60,188-195 semaphore): a
    global per-round cap of 7 URLs must defer identically to the oracle —
    the over-limit rows re-enter the next frontier with priority intact, so
    frontier snapshots, seen set, results and lineage all still replay."""
    cfg = CrawlConfig(
        use_bloom=True, bloom=BloomSpec(n_buckets=8, bits_per_shard=1 << 16),
        jar_limit=7,
    )
    out, ora = _run_both(spark, tmp_path, smoke_graph, with_robots=False, cfg=cfg)
    # the cap actually bit: more rounds than the unbounded BFS depth levels
    uncapped = crawl_oracle(
        pages_dict(smoke_graph.pages),
        list(smoke_graph.seeds.sort_values("seed_rank")["url"]),
    )
    assert len(ora.frontier_snapshots) > len(uncapped.frontier_snapshots)
    assert all(l["urls_in"] <= 7 for l in ora.lineage)
    _assert_match(spark, out, ora)


def test_bloom_off_equals_bloom_on(spark, smoke_graph, tmp_path):
    """The Bloom pre-filter is a pure optimization: identical outputs off/on."""
    cfg_off = CrawlConfig(use_bloom=False)
    out_off, ora = _run_both(spark, tmp_path / "off", smoke_graph, False, cfg_off)
    _assert_match(spark, out_off, ora)


@pytest.mark.slow
def test_replay_t2_multihost_skewed(spark, t2_graph, tmp_path):
    """8 hosts, ~6k pages, one host owns half the URLs (salting path),
    robots disallow rules active, generous budget."""
    cfg = CrawlConfig(use_bloom=True, bloom=BloomSpec(n_buckets=8, bits_per_shard=1 << 18))
    out, ora = _run_both(spark, tmp_path, t2_graph, with_robots=True, cfg=cfg)
    _assert_match(spark, out, ora)
    # robots actually blocked something: host4's d0s1 subtree is disallowed
    blocked_prefix = "https://host4.example.com/maven2/d0s1/"
    assert not any(u.startswith(blocked_prefix) for u in ora.seen)
    assert any(u.startswith("https://host4.example.com/maven2/d0s2/") for u in ora.seen)
