"""Multimodal plumbing tests: the Spark-side machinery (schema,
Arrow batches, metadata pruning) is real even though decode is a
deterministic stub."""

from __future__ import annotations

import numpy as np
import pytest

from map_reduce_spark.functions.multimodal import (
    FEATURE_DIM,
    FakeDecoder,
    extract_features,
    media_stats,
    synthetic_media,
)


def test_features_schema_and_shape(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media).collect()
    # video rows dropped (unsupported), image+audio kept
    assert {r.kind for r in feats} == {"image", "audio"}
    assert len(feats) == 20
    for r in feats:
        assert len(r.feature) == FEATURE_DIM
        norm = float(np.linalg.norm(r.feature))
        assert abs(norm - 1.0) < 1e-5
        assert r.n_bytes > 0


def test_unsupported_kind_raises_when_not_skipped(spark):
    media = synthetic_media(spark, n=6)  # includes video rows
    with pytest.raises(Exception, match="NotImplementedError|media library"):
        extract_features(media, skip_unsupported=False).collect()


def test_decoder_deterministic():
    payload = bytes(range(200))
    a = FakeDecoder.features(payload, "image")
    b = FakeDecoder.features(payload, "image")
    assert np.array_equal(a, b)


def test_media_stats_metadata_only(spark):
    media = synthetic_media(spark, n=30)
    rows = {r.kind: r.n_items for r in media_stats(media).collect()}
    assert rows == {"image": 10, "audio": 10, "video": 10}
