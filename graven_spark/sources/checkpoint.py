"""Atomic per-round checkpoint store (SURVEY.md §4.2.5, §7.0).

Iceberg-snapshot-shaped semantics on plain parquet directories: each round
writes its outputs under ``round_NNNNNN/`` and drops a ``_COMMIT`` marker
file **last**; resume scans for the highest committed round and discards any
uncommitted partial (the reference's analog: status-reset re-claim of
in-flight rows, /root/reference/graven/db/graven_database.py:159-165).

Layout (round k's directory holds the state *entering* round k):

    root/
      round_000000/            # seeded state
        frontier/  seen_delta/ shards/ meta.json  _COMMIT
      round_000001/            # after round 0 ran
        frontier/  seen_delta/ results_delta/ errors_delta/ lineage/
        shards/    meta.json   _COMMIT

``seen`` is read as the union of all ``seen_delta`` since the last
compaction; every ``compact_every`` rounds the store rewrites a consolidated
``seen_full`` so the file count (and the anti-join's scan set) stays bounded
over long crawls. Bloom shards are cumulative — only the latest committed
round's ``shards/`` is read.

Reading a round always goes through parquet, which also truncates the
iterative plan lineage: every round's Spark plan has constant size.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_ROUND_RE = re.compile(r"^round_(\d{6})$")

FRONTIER_SCHEMA = (
    "url string, host string, depth int, priority bigint, "
    "parent_url string, discovery_idx int, retry_count int"
)
SEEN_SCHEMA = "url_hash bigint, url string"
RESULTS_SCHEMA = (
    "url string, warc_ts timestamp, text string, lang string, "
    "depth int, round int, publish_ts timestamp"
)
ERRORS_SCHEMA = "round int, url string, stage string, reason string"
LINEAGE_SCHEMA = (
    "run_id string, round int, partition_id int, "
    "urls_in bigint, urls_out bigint, bytes_fetched bigint"
)


@dataclass
class RoundMeta:
    round: int
    priority_base: int
    frontier_count: int
    seen_compacted: bool = False  # this round dir holds a consolidated seen_full

    def to_json(self) -> str:
        return json.dumps(self.__dict__)

    @staticmethod
    def from_json(s: str) -> "RoundMeta":
        return RoundMeta(**json.loads(s))


class RoundStore:
    def __init__(self, root: str, compact_every: int = 8):
        self.root = root
        self.compact_every = compact_every
        os.makedirs(root, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def round_dir(self, k: int) -> str:
        return os.path.join(self.root, f"round_{k:06d}")

    def _p(self, k: int, name: str) -> str:
        return os.path.join(self.round_dir(k), name)

    # -- commit protocol ---------------------------------------------------
    def committed_rounds(self) -> list[int]:
        out = []
        for d in os.listdir(self.root):
            m = _ROUND_RE.match(d)
            if m and os.path.exists(os.path.join(self.root, d, "_COMMIT")):
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_round(self) -> int | None:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    def commit(self, k: int, meta: RoundMeta) -> None:
        with open(self._p(k, "meta.json"), "w") as f:
            f.write(meta.to_json())
        with open(self._p(k, "_COMMIT"), "w") as f:
            f.write("ok")

    def meta(self, k: int) -> RoundMeta:
        with open(self._p(k, "meta.json")) as f:
            return RoundMeta.from_json(f.read())

    # -- writers ------------------------------------------------------------
    def write(self, k: int, name: str, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self._p(k, name))

    # -- readers ------------------------------------------------------------
    def _read(self, spark: SparkSession, path: str, schema: str) -> DataFrame:
        return spark.read.schema(schema).parquet(path)

    def read_frontier(self, spark: SparkSession, k: int) -> DataFrame:
        return self._read(spark, self._p(k, "frontier"), FRONTIER_SCHEMA)

    def read_shards(self, spark: SparkSession, k: int) -> DataFrame | None:
        path = self._p(k, "shards")
        if not os.path.exists(path):
            return None
        return spark.read.parquet(path)

    def _seen_paths(self, upto_k: int) -> list[str]:
        """seen_full at the newest compaction ≤ upto_k, plus deltas after."""
        paths: list[str] = []
        base = 0
        for k in range(upto_k, -1, -1):
            if os.path.exists(self._p(k, "seen_full")):
                paths.append(self._p(k, "seen_full"))
                base = k + 1
                break
        for k in range(base, upto_k + 1):
            p = self._p(k, "seen_delta")
            if os.path.exists(p):
                paths.append(p)
        return paths

    def read_seen(self, spark: SparkSession, upto_k: int) -> DataFrame:
        return spark.read.schema(SEEN_SCHEMA).parquet(*self._seen_paths(upto_k))

    def maybe_compact_seen(self, spark: SparkSession, k: int) -> bool:
        """Consolidate seen deltas into round k's seen_full when due."""
        if k == 0 or k % self.compact_every != 0:
            return False
        seen = self.read_seen(spark, k)
        seen.write.mode("overwrite").parquet(self._p(k, "seen_full"))
        return True

    def read_union(self, spark: SparkSession, name: str, schema: str, upto_k: int) -> DataFrame:
        paths = [self._p(k, name) for k in range(upto_k + 1) if os.path.exists(self._p(k, name))]
        if not paths:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*paths)

    def read_results(self, spark: SparkSession, upto_k: int) -> DataFrame:
        return self.read_union(spark, "results_delta", RESULTS_SCHEMA, upto_k)

    def read_errors(self, spark: SparkSession, upto_k: int) -> DataFrame:
        return self.read_union(spark, "errors_delta", ERRORS_SCHEMA, upto_k)

    def read_lineage(self, spark: SparkSession, upto_k: int) -> DataFrame:
        return self.read_union(spark, "lineage", LINEAGE_SCHEMA, upto_k)
