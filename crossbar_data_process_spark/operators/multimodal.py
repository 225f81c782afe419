"""Multimodal (image/audio/video) column operators for training-data
pipelines (engine extension; repo charter: "multimodal columns").

Representation: media are opaque ``binary`` columns plus a typed metadata
struct (mime, width/height or sample_rate/duration, codec). Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages — the only operators in the engine allowed to enter
Python, because codec work is genuinely not expressible in Spark SQL.

The actual codecs (Pillow/librosa/ffmpeg) are NOT in this container, so the
decode kernel is stubbed behind ``_decode_stub`` — a deterministic fake
that derives pseudo-pixels from the bytes. Everything around the stub
(schemas, batch iteration, partition sizing, output contract) is the real
production plumbing and is tested.

Scale notes: media rows are large — keep ``spark.sql.files.maxPartitionBytes``
low for media tables so a partition's batch fits executor memory, and
project metadata columns *before* shuffles so the binary payload never
travels through an exchange it doesn't need to (late materialization).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _decode_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake decoder: real deployments replace this with
    Pillow/torchvision/librosa. Derives ``dim`` floats from byte content so
    tests can assert exact outputs."""
    if payload is None:
        raise NotImplementedError("real codec not available in this container")
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] * 31 + b) % 997
    return [a / 997.0 for a in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas. One Python
    worker per partition; batches stream through Arrow, so peak memory is
    one batch of payloads, not the partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "features": pdf["payload"].map(
                        lambda p: _decode_stub(p, dim)
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 4) -> DataFrame:
    """"Frame sampling" over the stub codec: emit one row per sampled frame
    (1 row → N rows, the video analogue of X9 explode). Real plumbing:
    output schema widens with a frame_no, payload slicing happens
    batch-wise in Arrow."""
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("frame_no", IntegerType()),
            StructField("frame_bytes", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_nos, out_frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for no, start in enumerate(range(0, len(payload), every_n_bytes)):
                    out_ids.append(mid)
                    out_nos.append(no)
                    out_frames.append(bytes(payload[start : start + every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_no": out_nos, "frame_bytes": out_frames}
            )

    return media.mapInPandas(run, schema=schema)


def attach_media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only stats stay in pure Column expressions — no Python, and
    Catalyst prunes the binary payload out of the scan entirely (verify:
    ReadSchema excludes ``payload``)."""
    return media.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        (F.col("meta.width") * F.col("meta.height")).alias("pixels"),
    )
