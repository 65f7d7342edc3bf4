"""Content-dedup extraction (--dedup-content): outputs must be
byte-identical to the per-URL extraction path, and the dedup plan must
run the Arrow UDF above a body_sha aggregate (once per distinct body)."""

import pytest

from graven_spark.plans.driver import crawl
from graven_spark.plans.frontier import CrawlConfig
from graven_spark.sources.synth import generate_graph, mini_specs


def _run(spark, tmp_path, name, cfg, graph):
    pages_path = str(tmp_path / "pages.parquet")
    if not (tmp_path / "pages.parquet").exists():
        pages = graph.pages.copy()
        pages["warc_ts"] = pages["warc_ts"].astype("datetime64[us]")
        pages.to_parquet(pages_path, index=False)
    seeds = spark.createDataFrame(graph.seeds)
    return crawl(spark, pages_path, seeds, None, str(tmp_path / name), cfg)


def _snapshot(spark, out):
    seen = sorted(r.url for r in out.seen(spark).collect())
    results = sorted(
        (r.url, r.text, str(r.warc_ts), r.depth, r.round, str(r.publish_ts))
        for r in out.results(spark).collect()
    )
    errors = sorted(
        (r.round, r.url, r.stage, r.reason) for r in out.errors(spark).collect()
    )
    lineage = sorted(
        (r.round, r.urls_in, r.urls_out, r.bytes_fetched)
        for r in out.lineage(spark).collect()
    )
    return seen, results, errors, lineage


def test_dedup_content_outputs_identical(spark, tmp_path):
    # shared leaf corpus → many URLs with byte-identical bodies, the case
    # dedup actually collapses; dir listings stay unique per URL
    graph = generate_graph(mini_specs(), leaf_texts=["alpha body", "beta body"])
    base = _run(spark, tmp_path, "off", CrawlConfig(), graph)
    dedup = _run(spark, tmp_path, "on", CrawlConfig(dedup_content=True), graph)
    assert _snapshot(spark, base) == _snapshot(spark, dedup)


def test_dedup_content_plan_shape(spark, tmp_path):
    """The extraction must sit above the per-body aggregate, not the
    per-URL rows: the JVM regexp extraction and first(html) appear in the
    same plan (round 6 moved extraction from an Arrow UDF to pure Catalyst,
    so no Python eval node may appear at all), and the join back to URLs
    keys on body_sha WITHOUT a forced broadcast (the distinct-body set is
    unbounded; AQE may still broadcast at runtime)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from graven_spark.functions.extract import dedup_body_extract, extract_links

    df = spark.range(100).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.encode(F.concat(F.lit("<a href=\"x/\">x</a>"),
                          (F.col("id") % 3).cast("string")), "utf-8")
        .alias("html"),
    )
    keyed = df.withColumn("body_sha", F.sha2(F.col("html"), 256))
    joined = dedup_body_extract(keyed, extract_links, "ext")
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "regexp_extract_all" in plan
    assert "ArrowEval" not in plan and "BatchEvalPython" not in plan
    assert "first(html" in plan
    # join keyed on the body hash; strategy is Catalyst's choice (no forced
    # hint in dedup_body_extract — AQE broadcasts at runtime iff small)
    assert "Join" in plan and "body_sha" in plan
    # the UDF input side is the aggregate output: partial_first shows the
    # map-side combine that keeps the shuffle at one body per hash/partition
    assert "partial_first" in plan
