"""Per-host politeness token buckets + robots.txt gating (north_rule;
reference analog: global 100-request cap,
/root/reference/graven/worker/crawler.py:27).

Selection is two-phase so one hot host (the reference's world is literally
single-host) can't pin a single task:

1. **local pre-prune** — a `(host, salt)`-partitioned window keeps only the
   ``budget`` smallest priorities per salted slice (JVM-side, parallel even
   for one host: the hot host is spread over ``n_salts`` slices);
2. **exact token bucket** — ``groupBy(host).applyInPandas`` over the ≤
   ``n_salts × budget`` survivors consumes tokens in priority order. This is
   the one place per-host sequential logic lives (SURVEY.md §2.10), and where
   a byte-cost-based budget would slot in.

Rows not selected stay in the frontier for the next round (backpressure is
structural, not sleep-based as in the reference's cache backoff,
/root/reference/graven/worker/downloader.py:149-153).

Robots gating (``gate_robots``) happens at admission time: blocked URLs never
enter the frontier at all. The rules table is tiny → broadcast hash join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_BUDGET = 1 << 30  # effectively unlimited when no robots row exists


def gate_robots(candidates: DataFrame, robots: DataFrame | None, url_col: str = "url") -> DataFrame:
    """Drop candidates whose URL path starts with a disallowed prefix for its
    host. Keeps hosts with no robots row."""
    if robots is None:
        return candidates
    rules = robots.select("host", "disallow_prefixes")
    path = F.parse_url(F.col(url_col), F.lit("PATH"))
    blocked = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array()),
        lambda p: path.startswith(p),
    )
    return (
        candidates.join(F.broadcast(rules), "host", "left")
        .filter(~blocked)
        .drop("disallow_prefixes")
    )


def select_round(
    frontier: DataFrame,
    robots: DataFrame | None,
    default_budget: int = DEFAULT_BUDGET,
    n_salts: int = 8,
) -> DataFrame:
    """Split the frontier into this round's fetch set vs deferred rows.

    Returns the frontier with a ``selected`` boolean column. Deterministic:
    per host, the ``budget`` smallest ``priority`` values win.
    """
    cols = frontier.columns
    if robots is not None:
        budgets = robots.select("host", F.col("crawl_delay_tokens").cast("long").alias("_budget"))
        frontier = frontier.join(F.broadcast(budgets), "host", "left")
    else:
        frontier = frontier.withColumn("_budget", F.lit(None).cast("long"))
    frontier = frontier.withColumn("_budget", F.coalesce("_budget", F.lit(default_budget)))

    # Phase 1: salted local top-k. Keeps ≤ n_salts×budget rows per host.
    salt = F.pmod(F.xxhash64("url"), F.lit(n_salts))
    w = Window.partitionBy(F.col("host"), salt).orderBy("priority")
    pruned = (
        frontier.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_budget"))
        .drop("_rn")
    )

    # Phase 2: exact per-host token bucket over the survivors.
    def take_budget(pdf: pd.DataFrame) -> pd.DataFrame:
        budget = int(pdf["_budget"].iloc[0])
        pdf = pdf.sort_values("priority", kind="mergesort")
        return pdf.iloc[:budget].drop(columns=["_budget"])

    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in frontier.schema.fields if f.name != "_budget")
    chosen = (
        pruned.groupBy("host")
        .applyInPandas(take_budget, schema)
        .select("url")
        .withColumn("selected", F.lit(True))
    )
    # Chosen set is budget-bounded → broadcast back onto the full frontier.
    return (
        frontier.drop("_budget")
        .join(F.broadcast(chosen), "url", "left")
        .withColumn("selected", F.coalesce("selected", F.lit(False)))
        .select(*cols, "selected")
    )
