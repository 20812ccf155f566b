"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched Pandas UDFs.

The Spark-side machinery here is real and tested — schema contracts,
``mapInPandas`` batch iteration, partition sizing — while the actual
media decode is stubbed behind ``FakeDecoder`` (the container has no
image/audio libraries; swap in PIL/libav by replacing one function).

Design for 100 TB of media:
- media bytes travel as a ``binary`` column next to typed metadata,
  so Catalyst prunes/filters on metadata without touching payloads;
- decode/feature steps are ``mapInPandas`` (Arrow batches, zero-copy
  into numpy) — per-batch Python cost is amortized, never per-row;
- ``spark.sql.files.maxPartitionBytes`` (or explicit repartition)
  keeps a partition's payload bytes within executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from map_reduce_spark.registry import register

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


class FakeDecoder:
    """Deterministic stand-in for a real media decoder.

    Real deployment: replace ``features`` with PIL/torchvision (image)
    or libav/torchaudio (audio) calls. Raises ``NotImplementedError``
    for kinds it does not model, exactly where a real decoder would.
    """

    SUPPORTED = {"image", "audio"}

    @staticmethod
    def features(payload: bytes, kind: str) -> np.ndarray:
        if kind not in FakeDecoder.SUPPORTED:
            raise NotImplementedError(
                f"decode for kind={kind!r} requires a media library not in this image"
            )
        # Deterministic pseudo-features from payload bytes: byte
        # histogram folded to FEATURE_DIM buckets, L2-normalized.
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float64)
        norm = np.linalg.norm(hist)
        return (hist / norm if norm > 0 else hist).astype(np.float32)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (seeded payloads)."""
    rng = np.random.default_rng(42)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=128 + (i % 5) * 64, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                64 + i % 32 if kind == "image" else None,
                64 + i % 16 if kind == "image" else None,
                1000 * (i % 30) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, skip_unsupported: bool = True) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (Arrow batches).

    ``skip_unsupported=True`` drops kinds the decoder cannot handle
    (video here); ``False`` propagates NotImplementedError — the
    choice a real pipeline makes between filter-and-log and fail-fast.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if skip_unsupported:
                pdf = pdf[pdf["kind"].isin(list(FakeDecoder.SUPPORTED))]
            if not len(pdf):
                continue
            feats = [
                FakeDecoder.features(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize the image subset so the longer side is ``max_side``.

    Plumbing is real (metadata filter prunes non-images BEFORE payload
    bytes move; Arrow-batched ``mapInPandas``; output schema carries
    the new dimensions); the pixel resample itself is the documented
    deterministic stand-in (payload truncated proportionally to the
    area ratio — swap in PIL's ``Image.resize`` for real pixels).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # corrupt/missing metadata (nullable ints arrive as NaN in
            # pandas) is skipped, mirroring extract_features'
            # skip_unsupported path — one bad row must not kill the job
            pdf = pdf[
                pdf["width"].notna()
                & pdf["height"].notna()
                & pdf["payload"].notna()
            ]
            if not len(pdf):
                continue
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            scale = (max_side / w.combine(h, max)).clip(upper=1.0)
            nw = (w * scale).astype("int64").clip(lower=1)
            nh = (h * scale).astype("int64").clip(lower=1)
            ratio = (nw * nh) / (w * h)
            payloads = [
                p[: max(1, int(len(p) * r))] for p, r in zip(pdf["payload"], ratio)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": nw.astype("int32"),
                    "height": nh.astype("int32"),
                    "payload": payloads,
                }
            )

    return media.filter(media.kind == "image").mapInPandas(batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)

FPS = 25  # fixture videos are modeled at a fixed frame rate


def sample_frames(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Sample one frame every ``every_ms`` from each video payload.

    The 1->N exploding shape of video processing: one input row yields
    ceil(duration/every_ms) frame rows, so output size is bounded by
    sampling rate, not by source frame count. Metadata (duration_ms)
    drives the schedule without decoding; the per-frame byte slice is
    the deterministic decoder stand-in (a real deployment seeks with
    libav and decodes only the sampled frames — same batch shape).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "frame_ts_ms": [],
                "frame_payload": [],
            }
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                # nullable longs arrive as NaN (not None) in pandas
                if pd.isna(dur) or payload is None or len(payload) == 0:
                    continue
                n_frames = max(1, int(dur) * FPS // 1000)
                frame_size = max(1, len(payload) // n_frames)
                for idx, ts in enumerate(range(0, int(dur), every_ms)):
                    fi = min(ts * FPS // 1000, n_frames - 1)
                    # the byte-slice stand-in caps at the payload tail
                    # (a real decoder seeks by timestamp, not offset)
                    start = min(fi * frame_size, len(payload) - frame_size)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["frame_ts_ms"].append(ts)
                    out["frame_payload"].append(
                        bytes(payload[start : start + frame_size])
                    )
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.filter(media.kind == "video").mapInPandas(batches, FRAMES_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation — never touches payload bytes, so the
    scan prunes the binary column entirely (check ReadSchema)."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.avg("width").alias("avg_width"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )


@register("media_feature_stats", oracle_sql=None)
def media_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-class multimodal query: synthetic media table ->
    mapInPandas decode/featurize -> per-kind feature statistics.

    ``sf_dir`` is unused: the fixture set has no media table, so the
    deterministic seeded ``synthetic_media`` corpus stands in (the
    Spark-side plumbing — binary payloads, Arrow batching, schema
    contract — is the part under test; the decoder itself is the
    documented stub). Rows-only driver check (no SQL oracle: the
    table is generated in-session, not a registered parquet view).
    """
    media = synthetic_media(spark, 96)
    feats = extract_features(media, skip_unsupported=True)
    fnorm = F.sqrt(
        F.aggregate(
            F.transform("feature", lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v * v,
        )
    )
    return (
        feats.withColumn("fnorm", fnorm)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
            F.round(F.avg("fnorm"), 4).alias("avg_feature_norm"),
        )
        .orderBy("kind")
    )
