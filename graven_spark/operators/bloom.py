"""Partitioned Bloom seen-filter shards (north_rule: "URL-seen dedup via a
partitioned Bloom/cuckoo filter"; SURVEY.md §4.2.2).

The seen set is split into ``n_buckets`` shards by ``pmod(xxhash64(url), B)``
— the same bucketing the exact ``seen`` table uses — and each shard is a
plain Bloom bitarray stored as one ``BinaryType`` row ``(bucket, filter)``.
Shards are built/merged distributed (``applyInPandas`` per bucket, numpy
bitwise ops) and probed with a **cogrouped** ``applyInPandas`` so a candidate
batch only ever meets its own bucket's shard — no broadcast of the full
filter, which at a 10^10-URL frontier would be tens of GB.

Probe semantics: bloom-negative ⇒ definitely new (skips the exact anti-join
entirely); bloom-positive ⇒ maybe seen ⇒ exact anti-join against the ``seen``
table decides. Correctness therefore never depends on the filter (tested with
the filter on/off); it only shrinks the expensive join's input.

Hashing: double hashing h_i = h1 + i*h2 (mod m_bits) over two JVM-computed
xxhash64 values — k memberships per URL at numpy speed, no Python hashing.

Reference parity: replaces the row-at-a-time UNIQUE-key probe at
/root/reference/graven/db/graven_database.py:103-115.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_SCHEMA = "bucket int, filter binary"
_H2_SALT = "graven_spark.bloom.h2"


@dataclass(frozen=True)
class BloomSpec:
    n_buckets: int = 16
    bits_per_shard: int = 1 << 20  # 128 KiB/shard default; size for expected n/bucket
    n_hashes: int = 7

    @property
    def shard_nbytes(self) -> int:
        return self.bits_per_shard // 8


def with_bloom_hashes(df: DataFrame, url_col: str = "url", spec: BloomSpec | None = None) -> DataFrame:
    """Attach bucket + the two 64-bit hashes, all JVM-side."""
    spec = spec or BloomSpec()
    return (
        df.withColumn("_h1", F.xxhash64(F.col(url_col)))
        .withColumn("_h2", F.xxhash64(F.lit(_H2_SALT), F.col(url_col)))
        .withColumn("bucket", F.pmod(F.col("_h1"), F.lit(spec.n_buckets)).cast("int"))
    )


def _bit_positions(h1: np.ndarray, h2: np.ndarray, spec: BloomSpec) -> np.ndarray:
    """(n, k) array of bit indexes via double hashing, uint64 wraparound ok."""
    h1 = h1.astype(np.uint64)
    h2 = h2.astype(np.uint64) | np.uint64(1)  # force odd step
    ks = np.arange(spec.n_hashes, dtype=np.uint64)
    return ((h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(spec.bits_per_shard)).astype(np.int64)


def _set_bits(filt: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(filt, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def _test_bits(filt: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(n, k) positions → (n,) all-bits-set membership."""
    return ((filt[pos >> 3] >> (pos & 7)) & 1).all(axis=1)


def build_shards(urls: DataFrame, spec: BloomSpec, url_col: str = "url") -> DataFrame:
    """Distributed shard build: one (bucket, filter) row per non-empty bucket."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        filt = np.zeros(spec.shard_nbytes, dtype=np.uint8)
        _set_bits(filt, _bit_positions(pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), spec))
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "filter": [filt.tobytes()]})

    hashed = with_bloom_hashes(urls.select(url_col), url_col, spec)
    return hashed.groupBy("bucket").applyInPandas(build, SHARD_SCHEMA)


def merge_shards(*shard_dfs: DataFrame) -> DataFrame:
    """OR together shard generations (old ∪ per-round deltas)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc: np.ndarray | None = None
        for raw in pdf["filter"]:
            arr = np.frombuffer(raw, dtype=np.uint8)
            acc = arr.copy() if acc is None else np.bitwise_or(acc, arr)
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "filter": [acc.tobytes()]})

    unioned = shard_dfs[0]
    for df in shard_dfs[1:]:
        unioned = unioned.unionByName(df)
    return unioned.groupBy("bucket").applyInPandas(merge, SHARD_SCHEMA)


def probe(
    candidates: DataFrame,
    shards: DataFrame,
    spec: BloomSpec,
    url_col: str = "url",
    track: list | None = None,
) -> DataFrame:
    """Default probe: broadcast the shard map (collected once per round,
    ``n_buckets × shard_nbytes`` — e.g. 32×256 KiB = 8 MiB) and test
    membership in a scalar pandas UDF over just the three hash columns.
    Only 24 bytes/row cross the Arrow boundary and there is **no shuffle**;
    measured ~10× faster than the cogrouped path at 7.5M candidates and it
    scales with cores. ``admit_new`` switches to :func:`probe_cogrouped`
    automatically when the total filter size exceeds its broadcast limit
    (e.g. the full 10^10-URL frontier), where shards must stay distributed.

    ``track``: optional list collecting the broadcast handle so the caller
    can ``destroy()`` it once its actions finish (one broadcast per round
    would otherwise accumulate over a long crawl)."""
    sc = candidates.sparkSession.sparkContext
    shard_map = {
        int(r["bucket"]): np.frombuffer(r["filter"], dtype=np.uint8)
        for r in shards.collect()
    }
    bc = sc.broadcast(shard_map)
    if track is not None:
        track.append(bc)

    @F.pandas_udf("boolean")
    def maybe_seen_udf(bucket: pd.Series, h1: pd.Series, h2: pd.Series) -> pd.Series:
        shards_local = bc.value
        out = np.zeros(len(bucket), dtype=bool)
        bvals = bucket.to_numpy()
        h1v, h2v = h1.to_numpy(), h2.to_numpy()
        for b in np.unique(bvals):
            filt = shards_local.get(int(b))
            if filt is None:
                continue
            mask = bvals == b
            pos = _bit_positions(h1v[mask], h2v[mask], spec)
            out[mask] = _test_bits(filt, pos)
        return pd.Series(out)

    hashed = with_bloom_hashes(candidates, url_col, spec)
    return (
        hashed.withColumn("maybe_seen", maybe_seen_udf("bucket", "_h1", "_h2"))
        .drop("_h1", "_h2", "bucket")
    )


def probe_cogrouped(candidates: DataFrame, shards: DataFrame, spec: BloomSpec, url_col: str = "url") -> DataFrame:
    """Cogrouped probe: adds ``maybe_seen`` boolean. Candidates co-shuffled
    with their (single) shard row by bucket — shard bytes move once per
    bucket, not once per candidate. The scale path for filters too large to
    broadcast; prefer :func:`probe` otherwise."""
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + ", maybe_seen boolean"

    def cogroup(cand: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
        if len(cand) == 0:
            return cand.drop(columns=["_h1", "_h2", "bucket"]).assign(maybe_seen=pd.Series(dtype=bool))
        if len(shard) == 0:
            maybe = np.zeros(len(cand), dtype=bool)
        else:
            filt = np.frombuffer(shard["filter"].iloc[0], dtype=np.uint8)
            pos = _bit_positions(cand["_h1"].to_numpy(), cand["_h2"].to_numpy(), spec)
            maybe = _test_bits(filt, pos)
        return cand.drop(columns=["_h1", "_h2", "bucket"]).assign(maybe_seen=maybe)

    hashed = with_bloom_hashes(candidates, url_col, spec)
    return (
        hashed.groupBy("bucket")
        .cogroup(shards.groupBy("bucket"))
        .applyInPandas(cogroup, out_schema)
    )
