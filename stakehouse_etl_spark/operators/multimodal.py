"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB (per the build brief): media
lives as an opaque ``binary`` column plus a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row
objects. The actual codec calls are STUBBED here (no image/audio libs
in this container — ``decode_media`` raises, ``fake_decode`` is the
deterministic stand-in); the Spark-side plumbing — schema, partition
flow, UDF signature, batch shape — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a text column as a binary payload — the plumbing-level
    stand-in for real media bytes (UTF-8 encode, JVM-side)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("blob").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_media(df: DataFrame, kind: str) -> DataFrame:
    """Real codec stage — NOT IMPLEMENTED in this container (no
    PIL/ffmpeg). The deployment contract: same mapInPandas shape as
    ``byte_features``/``fake_decode``, emitting decoded tensors as
    array<float> + corrected metadata."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; use fake_decode "
        "for plumbing tests and swap in the codec UDF at deployment"
    )


_BYTE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("byte_min", IntegerType()),
        StructField("byte_max", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def byte_features(media: DataFrame) -> DataFrame:
    """Feature-extraction stage over binary payloads via Arrow-batched
    ``mapInPandas``: bytes → numpy view → vectorized stats. The batch
    iterator shape (many payloads per Arrow batch, zero-copy into
    numpy) is exactly how a real decode/feature stage runs at scale."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].to_numpy(), pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                s = int(arr.sum())
                rows.append(
                    (
                        int(mid),
                        int(arr.size),
                        s,
                        int(arr.min()) if arr.size else 0,
                        int(arr.max()) if arr.size else 0,
                        s % 997,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_bytes",
                    "byte_sum",
                    "byte_min",
                    "byte_max",
                    "checksum",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        extract, schema=_BYTE_FEATURES_SCHEMA
    )


_RESAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_out", LongType()),
        StructField("out_sum", LongType()),
        StructField("out_min", IntegerType()),
        StructField("out_max", IntegerType()),
    ]
)


def resample_payload(media: DataFrame, stride: int = 4) -> DataFrame:
    """Resize/downsample stage (the image-resize / audio-resample
    analog): keep every ``stride``-th byte of the payload. Same
    Arrow-batched ``mapInPandas`` contract as the real codec stage —
    a deployment swaps the numpy stride for PIL.resize / librosa
    resample without touching the plan."""

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].to_numpy(), pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)[::stride]
                s = int(arr.sum())
                rows.append(
                    (
                        int(mid),
                        int(arr.size),
                        s,
                        int(arr.min()) if arr.size else 0,
                        int(arr.max()) if arr.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_out", "out_sum", "out_min", "out_max"]
            )

    return media.select("media_id", "payload").mapInPandas(
        resample, schema=_RESAMPLE_SCHEMA
    )


def fake_decode(media: DataFrame, frame_bytes: int = 64) -> DataFrame:
    """Deterministic stand-in for the codec: 'frames' are fixed-size
    byte stripes, 'pixels' are byte values — exercises the real
    frame-sampling partition flow (one input row → many frame rows)."""

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_mean", LongType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].to_numpy(), pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                for i in range(0, len(arr), frame_bytes):
                    chunk = arr[i : i + frame_bytes]
                    # integer mean (floor) keeps it engine-exact
                    rows.append((int(mid), i // frame_bytes, int(chunk.sum()) // len(chunk)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_mean"])

    return media.select("media_id", "payload").mapInPandas(decode, schema=schema)
