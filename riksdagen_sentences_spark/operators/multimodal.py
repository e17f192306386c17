"""Multimodal column support: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels.  Two decoders:

- ``decoder="fake"``: a deterministic feature vector folded from the
  payload bytes - the stand-in for heavy content decode (pixel
  tensors, spectrograms) whose libraries (PIL/librosa/ffmpeg) are not
  in this sandbox.  The Spark-side plumbing - schema, partitioning,
  UDF signature, Arrow batch shape - is identical to a real kernel's.
- ``decoder="real"``: REAL container-header decode in pure Python -
  PNG IHDR and JPEG SOF0/SOF2 width/height parsing (with a proper
  marker-segment walk past APPn headers), the same first step any
  production pipeline runs to filter/bucket images before the heavy
  decode.  Payloads that aren't PNG/JPEG come back format='unknown'
  with NULL dimensions instead of erroring (reference analog: the S5
  binary fetch+extract, /root/reference/models/providers/
  folketinget_file.py:24-127).

``synth_media_real`` generates structurally VALID PNG/JPEG byte
streams with planted dimensions (distributed mapInPandas over
spark.range - deterministic, no external data), so the real decoder
is oracle-checkable: the planted arithmetic IS the expected output.
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


def _png_bytes(width: int, height: int, body: bytes) -> bytes:
    """Minimal structurally-valid PNG: magic + IHDR chunk (length,
    type, 13-byte data, zero CRC - header parsers don't checksum) +
    deterministic trailing body."""
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # bit depth 8, truecolor
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + len(ihdr).to_bytes(4, "big")
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"
        + body
    )


def _jpeg_bytes(
    width: int, height: int, body: bytes, sof_marker: int = 0xC0
) -> bytes:
    """Minimal structurally-valid JPEG: SOI + APP0/JFIF + SOF0 or SOF2
    frame header (3 components) + body + EOI.  The APP0 segment forces
    decoders to actually WALK the marker stream rather than read a
    fixed offset."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof = (
        bytes([8])  # precision
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])  # 3 components
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + (len(app0) + 2).to_bytes(2, "big") + app0
        + bytes([0xFF, sof_marker])
        + (len(sof) + 2).to_bytes(2, "big") + sof
        + body
        + b"\xff\xd9"
    )


_BODY_LEN = 32
PNG_TOTAL_BYTES = len(_png_bytes(1, 1, b"\x00" * _BODY_LEN))
JPEG_TOTAL_BYTES = len(_jpeg_bytes(1, 1, b"\x00" * _BODY_LEN))

REAL_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("format", StringType()),  # png | jpeg | unknown
        StructField("n_bytes", LongType()),
        StructField("decoded_width", IntegerType()),
        StructField("decoded_height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

# JPEG markers in the SOF range that are NOT frame headers
_NON_SOF = (0xC4, 0xC8, 0xCC)


def parse_image_dims(b: bytes) -> tuple[str, int | None, int | None]:
    """(format, width, height) from a PNG IHDR or JPEG SOFn header -
    pure Python, no imaging library.  Unknown/corrupt containers come
    back ('unknown', None, None) rather than raising: at corpus scale
    a malformed payload must not kill the task."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker == 0xD9:  # EOI before any SOF
                break
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in _NON_SOF:
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            i += 2 + seg_len
        return ("jpeg", None, None)
    return ("unknown", None, None)


def synth_media_real(
    spark: SparkSession, n: int = 64, seed: int = 42
) -> DataFrame:
    """Deterministic synthetic media with REAL container bytes: even
    ids are PNG, odd ids JPEG (alternating SOF0/SOF2 frame headers),
    width = id % 300 + 16, height = id % 200 + 16, 32-byte sha256 body.
    Distributed generation (mapInPandas over spark.range)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["id"]:
                i = int(raw)
                w, h = i % 300 + 16, i % 200 + 16
                body = hashlib.sha256(
                    f"body:{seed}:{i}".encode()
                ).digest()[:_BODY_LEN]
                if i % 2 == 0:
                    payload, mime = _png_bytes(w, h, body), "image/png"
                else:
                    sof = 0xC0 if i % 4 == 1 else 0xC2
                    payload, mime = (
                        _jpeg_bytes(w, h, body, sof),
                        "image/jpeg",
                    )
                mid = hashlib.sha256(f"media:{seed}:{i}".encode()).hexdigest()
                rows.append((mid, "image", mime, w, h, 0, payload))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "mime", "width", "height",
                    "duration_ms", "payload",
                ],
            )

    return spark.range(n).mapInPandas(kernel, MEDIA_SCHEMA)


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

    ``decoder="fake"`` -> FEATURES_SCHEMA with the deterministic
    byte-fold feature vector (the content-decode stand-in).
    ``decoder="real"`` -> REAL_FEATURES_SCHEMA: actual PNG IHDR / JPEG
    SOFn width-height parsing (parse_image_dims, pure Python inside the
    Arrow kernel - no imaging library needed for the header step),
    plus the same payload feature fold.  The batch shape
    (Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]) is exactly what
    a full PIL/librosa/ffmpeg kernel would use - swapping the heavy
    pixel decode in changes one line of this kernel."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            feats = [_fake_decode(p) for p in payloads]
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) for p in payloads],
                "features": feats,
            }
            if decoder == "real":
                dims = [parse_image_dims(p) for p in payloads]
                out["format"] = [d[0] for d in dims]
                out["decoded_width"] = pd.array(
                    [d[1] for d in dims], dtype="Int32"
                )
                out["decoded_height"] = pd.array(
                    [d[2] for d in dims], dtype="Int32"
                )
                cols = [f.name for f in REAL_FEATURES_SCHEMA.fields]
                yield pd.DataFrame(out)[cols]
            else:
                yield pd.DataFrame(out)

    schema = REAL_FEATURES_SCHEMA if decoder == "real" else FEATURES_SCHEMA
    return media.mapInPandas(kernel, schema)


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
