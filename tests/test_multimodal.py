"""Multimodal binary-column plumbing: schema, batch shape, determinism,
and the strict (honest NotImplementedError) decode gate."""

from __future__ import annotations

import numpy as np
import pytest

from graven_spark.sources.multimodal import extract_features, synth_media


def test_feature_extraction_shape_and_determinism(spark):
    media = synth_media(spark, 32)
    out = extract_features(media)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 32
    r0 = rows[0]
    assert len(r0.feature) == 256
    assert abs(sum(r0.feature) - 1.0) < 1e-3  # normalized histogram
    assert r0.n_bytes > 0 and 0 <= r0.byte_entropy <= 8.0
    # deterministic across runs
    rows2 = {r.media_id: r for r in extract_features(media).collect()}
    assert rows2[0].feature == r0.feature


def test_custom_decoder_plugs_in(spark):
    media = synth_media(spark, 8)

    def decoder(payload: bytes) -> np.ndarray:
        return np.array([float(len(payload))], dtype=np.float32)

    out = {r.media_id: r for r in extract_features(media, decoder=decoder).collect()}
    assert all(len(r.feature) == 1 and r.feature[0] == r.n_bytes for r in out.values())


def test_strict_mode_raises(spark):
    with pytest.raises(NotImplementedError):
        extract_features(synth_media(spark, 2), strict=True)
