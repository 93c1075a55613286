"""Multimodal (image/audio/video) column plumbing.

Beyond-reference extension.  Media payloads are opaque ``binary``
columns travelling next to typed metadata; decode / feature-extract /
resize run as Arrow-batched ``mapInPandas`` stages so bytes never
round-trip through Python row-at-a-time.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT available in this
environment, so the decode kernels are stubbed: :func:`decode_image`
raises ``NotImplementedError`` where a real decoder would run, and
:func:`fake_decode_meta` provides a deterministic stand-in (derived
from the payload bytes) so the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal record: payload + typed metadata.  All fields
#: nullable — plain ``select`` projections produce nullable columns, and
#: schema equality checks should not hinge on nullability flags.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), True),
        StructField("modality", StringType(), True),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("source", StringType(), True),
    ]
)

#: decode output: metadata a real image decoder would produce.
DECODED_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), True),
        StructField("modality", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sha_prefix", StringType(), True),
    ]
)


def binary_media_df(
    df: DataFrame,
    id_col: str,
    payload_text_col: str,
    modality: str = "image",
    source_col: str | None = None,
) -> DataFrame:
    """Adapt any table with an id + a text/bytes column into the
    canonical MEDIA_SCHEMA frame (test harness: encodes text as the
    payload since no real media ships in the fixtures)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col(payload_text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
        (F.col(source_col) if source_col else F.lit(None).cast("string")).alias(
            "source"
        ),
    )


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real decoder hook — would return (width, height) via PIL.
    Image libraries are not installed in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this "
        "environment; use fake_decode_meta for plumbing tests"
    )


def fake_decode_meta(payload: bytes | None) -> tuple[int, int, str]:
    """Deterministic stand-in for decode: derives (width, height,
    sha_prefix) purely from the payload bytes."""
    import hashlib

    if payload is None:
        return 0, 0, ""
    digest = hashlib.sha256(payload).hexdigest()
    width = 16 + int(digest[:4], 16) % 2048
    height = 16 + int(digest[4:8], 16) % 2048
    return width, height, digest[:12]


def decode_media_meta(df: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Arrow-batched decode stage: MEDIA_SCHEMA → DECODED_META_SCHEMA.

    ``mapInPandas`` keeps the payload bytes in columnar Arrow batches;
    each batch is decoded in one Python call (the shape a real
    PIL/ffmpeg kernel needs)."""

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                (
                    fake_decode_meta(p)
                    if not use_real_decoder
                    else decode_image(p)
                )
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "sha_prefix": [m[2] for m in metas],
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_META_SCHEMA)


RESIZED_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), True),
        StructField("modality", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def resize_media(
    df: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Arrow-batched resize stage: aspect-fit each decoded image into
    (target_w, target_h).  The geometry (what a real resampler needs to
    compute output dims) is real; the pixel resampling itself would
    need PIL/opencv, so the payload passes through unchanged — same
    stub posture as :func:`decode_image`."""

    def resize_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs = [], []
            for p in pdf["payload"]:
                w, h, _ = fake_decode_meta(p)
                if w <= 0 or h <= 0:
                    ws.append(0)
                    hs.append(0)
                    continue
                scale = min(target_w / w, target_h / h)
                ws.append(max(1, int(w * scale)))
                hs.append(max(1, int(h * scale)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": pdf["payload"],
                    "width": ws,
                    "height": hs,
                }
            )

    return df.mapInPandas(resize_batches, schema=RESIZED_META_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature-extraction stage: one ``array<float>`` per
    media item.  A real encoder (CLIP/ViT) is not available in this
    environment; the deterministic stand-in derives ``dim`` floats in
    [-1, 1) from the payload's sha256 — stable across runs and
    executors, so downstream similarity plumbing is fully testable."""
    import hashlib
    import struct

    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("media_id", LongType(), True),
            StructField("modality", StringType(), True),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )

    def feature_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        def feats(payload: bytes | None) -> list[float]:
            if payload is None:
                return [0.0] * dim
            out: list[float] = []
            counter = 0
            while len(out) < dim:
                block = hashlib.sha256(
                    payload + counter.to_bytes(4, "big")
                ).digest()
                for i in range(0, 32, 4):
                    (u,) = struct.unpack(">I", block[i : i + 4])
                    out.append(u / 2**31 - 1.0)
                counter += 1
            return out[:dim]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "features": [feats(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(feature_batches, schema=schema)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* plumbing: one output row per sampled
    frame index (real frame extraction would decode at these indices).
    Demonstrates the explode-based fan-out shape used for frame-level
    datasets."""
    n_frames = (F.octet_length("payload") / 1024 + 1).cast("int")
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames, F.lit(every_n))
        ).alias("frame_index"),
    )
