"""Streaming stages over arriving pages/events.

- :func:`stream_extract` — readStream over a pages directory → Arrow-UDF
  text extraction → append sink. The downloader/extractor stages of the
  reference pipeline as a continuous flow (the crawler's frontier recursion
  itself stays in the round driver: recursive self-feeding is not a
  streaming-source shape).
- :func:`windowed_rates` — tumbling-window throughput stats with a
  watermark: the streaming analog of the reference's per-stage counters
  (/root/reference/graven/shared/timer.py:47-57).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.extract import extract_text

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_extract(spark: SparkSession, pages_dir: str) -> DataFrame:
    """Streaming DataFrame: pages → (url, text, lang) via the Arrow UDF."""
    stream = (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )
    return stream.select(
        "url", extract_text(F.col("html")).alias("text"), "lang", "warc_ts"
    )


def windowed_rates(pages_stream: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window page counts with late-data watermark."""
    return (
        pages_stream.withWatermark("warc_ts", "2 hours")
        .groupBy(F.window("warc_ts", window), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("window.start").alias("win_start"),
            "lang",
            "n_pages",
        )
    )


def stream_host_budget(pages_stream: DataFrame, budget: int) -> DataFrame:
    """Custom stateful operator (north_rule: "applyInPandasWithState for
    custom stateful operators"): per-host fetch-budget enforcement whose
    token count PERSISTS ACROSS MICRO-BATCHES — the streaming form of the
    batch token bucket (operators/politeness.py W3). State per host is one
    long (tokens consumed); each batch admits rows in (warc_ts, url) order
    until the host's lifetime budget is exhausted and emits
    (url, host, warc_ts). At scale state is hash-partitioned by host and
    checkpointed by the engine — no driver residency."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def admit(key, pdfs, state: GroupState):
        taken = state.get[0] if state.exists else 0
        # a host's micro-batch may arrive as several Arrow chunks: the
        # (warc_ts, url) order must be established over the WHOLE batch
        # before budgeting, or a later chunk's earlier rows lose their slot.
        # Memory bound: one host's rows for one micro-batch.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["warc_ts", "url"]).head(max(budget - taken, 0))
        taken += len(pdf)
        state.update((taken,))
        if len(pdf):
            yield pdf[["url", "host", "warc_ts"]]

    return (
        pages_stream.select("url", "host", "warc_ts")
        .groupBy("host")
        .applyInPandasWithState(
            admit,
            outputStructType="url string, host string, warc_ts timestamp",
            stateStructType="taken long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(spark: SparkSession, df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drive a streaming query to completion over the currently-available
    files (test/smoke harness) and return the collected sink table."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")
