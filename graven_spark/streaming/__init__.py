"""Structured-Streaming surface (SURVEY.md §2.9).

The reference is an *iterative* pipeline, not a streaming system — its loop
condition is frontier-emptiness (/root/reference/graven/worker/crawler.py:130-163)
— so the engine's primary execution mode is the deterministic round driver
(plans/driver.py). This module provides the streaming entry points for users
who want the crawl's downstream stages (extraction, enrichment, stats) to run
continuously over arriving page batches.
"""

from .pipeline import stream_extract, windowed_rates  # noqa: F401
