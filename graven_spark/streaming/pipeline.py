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


_WINDOW_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _window_seconds(window: str | int) -> int:
    if isinstance(window, int):
        return window
    n, unit = window.split()
    return int(n) * _WINDOW_UNITS[unit]


def stream_host_budget(
    pages_stream: DataFrame, budget: int, window: str | int | None = None
) -> DataFrame:
    """Custom stateful operator (north_rule: "applyInPandasWithState for
    custom stateful operators"): per-host fetch-budget enforcement whose
    token count PERSISTS ACROSS MICRO-BATCHES — the streaming form of the
    batch token bucket (operators/politeness.py W3).

    ``window=None``: lifetime budget (tokens never refresh). With a window
    (e.g. ``"1 hour"``), tokens REFRESH per event-time tumbling window —
    the streaming analog of the batch driver's per-ROUND budget: each
    window is a round with a fresh allowance, and a window's consumption
    spans micro-batches. State per host is (current window start, tokens
    consumed in it); rows later than the state's window roll it forward and
    reset the count; stragglers from already-passed windows draw from the
    current window's allowance (conservative: late data can never overspend
    a closed window). Each batch admits rows in (warc_ts, url) order and
    emits (url, host, warc_ts). At scale state is hash-partitioned by host
    and checkpointed by the engine — no driver residency."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    win_s = None if window is None else _window_seconds(window)

    def admit(key, pdfs, state: GroupState):
        win_start, taken = state.get if state.exists else (-1, 0)
        # a host's micro-batch may arrive as several Arrow chunks: the
        # (warc_ts, url) order must be established over the WHOLE batch
        # before budgeting, or a later chunk's earlier rows lose their slot.
        # Memory bound: one host's rows for one micro-batch.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["warc_ts", "url"])
        if win_s is None:
            pdf = pdf.head(max(budget - taken, 0))
            taken += len(pdf)
            state.update((win_start, taken))
            if len(pdf):
                yield pdf[["url", "host", "warc_ts"]]
            return
        epoch = (pdf["warc_ts"].astype("int64") // 10**9).to_numpy()
        out = []
        for i in range(len(pdf)):
            row_win = int(epoch[i]) // win_s * win_s
            if row_win > win_start:  # next window: refresh the allowance
                win_start, taken = row_win, 0
            if taken < budget:
                taken += 1
                out.append(i)
        state.update((win_start, taken))
        if out:
            yield pdf.iloc[out][["url", "host", "warc_ts"]]

    return (
        pages_stream.select("url", "host", "warc_ts")
        .groupBy("host")
        .applyInPandasWithState(
            admit,
            outputStructType="url string, host string, warc_ts timestamp",
            stateStructType="win_start long, taken long",
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
