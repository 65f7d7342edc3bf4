"""Structured-Streaming surface: file-stream extraction produces the same
rows as the batch path; watermarked windowed rates aggregate correctly."""

from __future__ import annotations

from pyspark.sql import functions as F

from graven_spark.sources import synth
from graven_spark.streaming.pipeline import (
    run_to_memory,
    stream_extract,
    stream_host_budget,
    windowed_rates,
)


def test_stream_extract_matches_golden_text(spark, smoke_graph, tmp_path):
    pages_dir = str(tmp_path / "pages_stream")
    spark.createDataFrame(smoke_graph.pages).repartition(6).write.parquet(pages_dir)

    out = run_to_memory(spark, stream_extract(spark, pages_dir), "stream_extract_t")
    got = {r.url: r.text for r in out.collect()}
    want = dict(zip(smoke_graph.pages.url, smoke_graph.pages.text))
    assert got == want  # byte-identical, same invariant as the batch path


def test_windowed_rates(spark, smoke_graph, tmp_path):
    pages_dir = str(tmp_path / "pages_stream2")
    spark.createDataFrame(smoke_graph.pages).repartition(4).write.parquet(pages_dir)
    stream = stream_extract(spark, pages_dir)
    # complete mode: append would hold back windows the final watermark
    # hasn't passed yet (stream ends before the last window closes)
    out = run_to_memory(spark, windowed_rates(stream, "24 hours"), "win_rates_t",
                        output_mode="complete")
    rows = out.collect()
    assert sum(r.n_pages for r in rows) == len(smoke_graph.pages)
    assert all(r.lang in ("en", "de", "ja") for r in rows)


def test_stream_host_budget_state_spans_batches(spark, t2_graph, tmp_path):
    """Per-host tokens persist across micro-batches: with the 8-host t2
    graph streamed 4 files at a time, each host admits exactly
    min(budget, its page count) in total — impossible without cross-batch
    state (any single batch holds only a slice of a host's pages)."""
    pages_dir = str(tmp_path / "pages_state")
    pd_pages = t2_graph.pages.assign(host=t2_graph.pages.url.str.split("/").str[2])
    spark.createDataFrame(
        pd_pages[["url", "host", "warc_ts"]]
    ).repartition(12).write.parquet(pages_dir)

    budget = 40
    stream = (
        spark.readStream.schema("url string, host string, warc_ts timestamp")
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )
    out = run_to_memory(
        spark, stream_host_budget(stream, budget), "host_budget_t"
    )
    got = {r.host: r.n for r in out.groupBy("host").agg(F.count("*").alias("n")).collect()}
    want = {
        h: min(budget, int(n)) for h, n in pd_pages.groupby("host").size().items()
    }
    assert got == want
