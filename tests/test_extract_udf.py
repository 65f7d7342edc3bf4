"""The two Arrow UDFs against their pure-Python definitions — the
byte-identical extraction invariant (BASELINE.json input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graven_spark.core import extract_links_strict_py, extract_text_py
from graven_spark.functions.extract import extract_links, extract_text


def test_extract_text_udf_byte_identical(spark, smoke_graph):
    df = spark.createDataFrame(smoke_graph.pages[["url", "html"]])
    got = {r.url: r.t for r in df.select("url", extract_text(F.col("html")).alias("t")).collect()}
    for r in smoke_graph.pages.itertuples():
        assert got[r.url] == extract_text_py(r.html) == r.text


def test_extract_links_udf_matches_python(spark, smoke_graph):
    df = spark.createDataFrame(smoke_graph.pages[["url", "html"]])
    got = {
        r.url: (r.e.links, r.e.parse_failed)
        for r in df.select("url", extract_links(F.col("html")).alias("e")).collect()
    }
    for r in smoke_graph.pages.itertuples():
        links, failed = extract_links_strict_py(r.html)
        g_links, g_failed = got[r.url]
        assert g_failed == failed
        assert [(l.href, l.is_dir, l.ts_str) for l in g_links] == [
            (l.href, l.is_dir, l.ts_str) for l in links
        ]
