"""Multimodal column support: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels.  The decode step itself is STUBBED in this
sandbox (no image/audio libraries are installed): ``decoder="fake"``
produces a deterministic feature vector from the payload bytes so the
Spark-side plumbing - schema, partitioning, UDF signature, Arrow batch
shape - is real and tested; ``decoder="real"`` raises NotImplementedError
at the exact point a PIL/ffmpeg call would go.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded sha256
    stream; no external data)."""
    df = spark.range(n).select(
        F.sha2(F.concat(F.lit(f"media:{seed}:"), F.col("id")), 256).alias(
            "media_id"
        ),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("id") % 64 + 1).cast("int").alias("width"),
        (F.col("id") % 48 + 1).cast("int").alias("height"),
        (F.col("id") * 1000).alias("duration_ms"),
        # payload = UTF-8 bytes of a sha256 hex string: deterministic,
        # and exactly reproducible in the DuckDB oracle (which has
        # sha256 but not sha512)
        F.sha2(F.concat(F.lit(f"payload:{seed}:"), F.col("id")), 256)
        .cast("binary")
        .alias("payload"),
    )
    return df


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: fold sha256(payload)
    into FEATURE_DIM floats in [0, 1)."""
    h = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65536.0
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    media: DataFrame, decoder: str = "fake"
) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads.

    The batch shape (Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]) is
    exactly what a real PIL/librosa/ffmpeg kernel would use - only the
    per-payload decode call is stubbed."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg - not available "
                    "in this sandbox; plug the decoder in here"
                )
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp
    (the decode of each frame is the stubbed step).  Pure column ops -
    the expensive explode happens BEFORE decode so frames distribute
    across the cluster."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames
