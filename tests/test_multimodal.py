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
    resize_images,
    sample_frames,
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


def test_resize_bounds_dimensions_and_prunes_payload(spark):
    media = synthetic_media(spark, n=30)
    originals = {r.media_id: r for r in media.filter("kind = 'image'").collect()}
    resized = resize_images(media, max_side=32).collect()
    assert len(resized) == len(originals)
    for r in resized:
        o = originals[r.media_id]
        assert max(r.width, r.height) <= 32
        # aspect handling: never upscale, never exceed original
        assert r.width <= o.width and r.height <= o.height
        assert 0 < len(r.payload) <= len(o.payload)


def test_frame_sampling_is_bounded_by_rate_not_source(spark):
    media = synthetic_media(spark, n=30)
    videos = {r.media_id: r for r in media.filter("kind = 'video'").collect()}
    frames = sample_frames(media, every_ms=5000).collect()
    by_id: dict[int, list] = {}
    for f in frames:
        by_id.setdefault(f.media_id, []).append(f)
    for mid, fs in by_id.items():
        dur = videos[mid].duration_ms
        expected = max(1, -(-int(dur) // 5000)) if dur else 0
        assert len(fs) == expected  # one frame per sampling tick
        assert all(f.frame_ts_ms < dur for f in fs)
        assert all(len(f.frame_payload) > 0 for f in fs)
    # zero-duration videos yield nothing; all sampled ids are videos
    assert set(by_id) <= set(videos)
