"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed in Arrow-batched ``mapInPandas`` UDFs.

The decode step is STUBBED (no image/audio libs in this container): by
default it is a deterministic fake (size-preserving byte stats) so the
Spark-side plumbing — schema, partitioning, UDF signature, batch shape — is
real and tested; pass ``decoder=`` to plug a real one (PIL/librosa/ffmpeg)
on a production cluster, or ``strict=True`` to get the honest
``NotImplementedError``.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, byte_mean double, "
    "byte_entropy double, feature array<float>"
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decoded frame': the byte histogram (256-dim),
    normalized. Stands in for pixel/PCM decoding."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype(np.float32)
    total = hist.sum() or 1.0
    return hist / total


def feature_row(payload: bytes, decode: Callable[[bytes], np.ndarray] | None = None):
    """(vec, n_bytes, byte_mean, byte_entropy) for one payload — the single
    definition both the Arrow UDF and the DuckDB-oracle generator use, so
    the CORRECTNESS hash compares bit-identical doubles."""
    decode = decode or _fake_decode
    vec = decode(payload)
    arr = np.frombuffer(payload, dtype=np.uint8)
    p = vec[vec > 0]
    mean = round(float(arr.mean()) if len(arr) else 0.0, 6)
    ent = round(float(-(p * np.log2(p)).sum()) if len(p) else 0.0, 6)
    return vec.astype(np.float32), len(payload), mean, ent


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] | None = None,
    strict: bool = False,
    batch_size_hint: int = 256,
) -> DataFrame:
    """media(media_id, kind, payload, ...) → per-item feature rows.

    ``mapInPandas`` so one Arrow batch holds many binary payloads; heavy
    per-item work (real decode) amortizes Python dispatch across the batch.
    Column pruning applies upstream: only (media_id, kind, payload) is read.
    """
    if strict and decoder is None:
        raise NotImplementedError(
            "real media decoding is not available in this environment; "
            "pass decoder= (e.g. PIL-based) on a cluster with codec libs"
        )
    decode = decoder or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, n_bytes, means, ents = [], [], [], []
            for payload in pdf["payload"]:
                vec, nb, mean, ent = feature_row(payload, decode)
                feats.append(vec)
                n_bytes.append(nb)
                means.append(mean)
                ents.append(ent)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "byte_mean": means,
                    "byte_entropy": ents,
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def media_rows(n: int = 64) -> list[tuple]:
    """Deterministic fake media rows (binary payload derived from the id —
    no external data). Pure Python so the DuckDB oracle can regenerate the
    identical payloads."""
    import hashlib

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        seed = hashlib.md5(f"media{i}".encode()).digest()
        payload = (seed * (8 + i % 32))[: 128 + (i * 37) % 512]
        rows.append(
            (i, kinds[i % 3], payload, f"application/x-fake-{kinds[i % 3]}",
             64 + i % 128, 64 + (i * 3) % 128, 1000 + i * 10)
        )
    return rows


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    return spark.createDataFrame(media_rows(n), MEDIA_SCHEMA)
