"""Multimodal plumbing tests: schemas, Arrow batch flow, 1→N frame
sampling, and payload pruning for metadata-only queries."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from crossbar_data_process_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _decode_stub,
    attach_media_stats,
    extract_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id="m1", payload=bytes(range(16)),
            meta=Row(mime="image/png", width=4, height=4)),
        Row(media_id="m2", payload=b"\xff\x00\xff\x00abcdef",
            meta=Row(mime="image/jpeg", width=2, height=5)),
        Row(media_id="m3", payload=b"xyz",
            meta=Row(mime="audio/wav", width=None, height=None)),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_extract_features(spark, media):
    out = {r.media_id: r for r in extract_features(media, dim=4).collect()}
    assert set(out) == {"m1", "m2", "m3"}
    assert out["m1"].n_bytes == 16
    # deterministic stub: same bytes -> same features
    assert out["m1"].features == pytest.approx(_decode_stub(bytes(range(16)), 4))
    assert len(out["m3"].features) == 4


def test_frame_sample(spark, media):
    frames = frame_sample(media, every_n_bytes=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id["m1"]) == 4          # 16 bytes / 4
    assert len(by_id["m2"]) == 3          # 10 bytes -> 3 frames (last short)
    assert len(by_id["m3"]) == 1
    assert by_id["m1"][0].frame_bytes == bytes(range(4))


def test_metadata_only_prunes_payload(spark, media, tmp_path):
    # write to parquet and verify the metadata-only plan never reads payload
    path = str(tmp_path / "media.parquet")
    media.write.mode("overwrite").parquet(path)
    df = attach_media_stats(spark.read.parquet(path))
    plan = df.queryExecution if hasattr(df, "queryExecution") else None
    explained = df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in explained.split("ReadSchema")[-1]
    rows = {r.media_id: r.pixels for r in df.collect()}
    assert rows == {"m1": 16, "m2": 10, "m3": None}
