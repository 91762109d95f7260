"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas kernels.

The decode libraries (PIL/librosa/ffmpeg) are NOT in this container, so the
decode step is a clearly-marked stub behind an import-try (deterministic
fake features in tests) — the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) is real and tested (SURVEY build contract).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _decode_image(payload: bytes) -> np.ndarray:
    """Real decoders are not installed in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - always taken in sandbox
        raise NotImplementedError(
            "image decode requires PIL; container has no image libs — "
            "use fake_feature for tests"
        ) from exc
    raise NotImplementedError("wire PIL decode here on a real cluster")


def fake_feature(payload: bytes | None, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature: byte histogram folded to `dim` floats."""
    if not payload:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    return hist / max(1.0, float(arr.size))


def extract_features(
    media: DataFrame, dim: int = 8, use_real_decode: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow batches stream through a pandas kernel; each batch is processed
    columnar-vectorized where possible.  Partitioning: inherit upstream
    (payloads should be stored with media-id bucketing so one task's batch
    is contiguous bytes on disk).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decode:
                feats = [_decode_image(p) for p in pdf["payload"]]
            else:
                feats = [fake_feature(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode sample timestamps from typed
    metadata (duration_ms) without touching payload bytes — the expensive
    decode happens only downstream on the (media_id, ts_ms) work list."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("ts_ms"),
    )
