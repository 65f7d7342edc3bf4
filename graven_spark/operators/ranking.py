"""Scalable global FIFO ranking (SURVEY.md §2.5 W1/W2).

The round plan needs each fetched URL's 0-based rank in global priority
order (the reference's FIFO dequeue position — children inherit it into
their own priorities, core.py arithmetic). A bare
``row_number() OVER (ORDER BY priority)`` funnels the whole set through one
partition; instead:

1. range-repartition by the order key (partitions are globally ordered);
2. sort within partitions (no extra shuffle);
3. count rows per partition (tiny collect: one long per partition);
4. ``mapInPandas`` adds ``partition_offset + local_index``.

One range shuffle total, every stage parallel. For budget-bounded round sets
this is overkill locally but is the shape that survives 1000 executors.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_col: str = "priority",
    rank_col: str = "fifo_rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Attach a dense 0-based global rank by ``order_col`` (must be unique).

    Returns ``(ranked_df, total_rows)`` — the count falls out of the
    per-partition offsets for free."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Persist the (pruned) input: repartitionByRange's range-boundary
    # sampling is its own job, and the offsets count is another — without
    # this, each re-executes the full upstream plan.
    df = df.persist()
    ranged = df.repartitionByRange(n, F.col(order_col)).sortWithinPartitions(order_col)
    ranged = ranged.persist()
    counts = (
        ranged.groupBy(F.spark_partition_id().alias("_pid"))
        .count()
        .collect()
    )
    by_pid = {r["_pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    schema_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{rank_col}` bigint"

    def add_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        local = offsets.get(pid, 0)
        for pdf in batches:
            pdf[rank_col] = range(local, local + len(pdf))
            local += len(pdf)
            yield pdf

    return ranged.mapInPandas(add_rank, schema_ddl), acc
