"""Multimodal plumbing tests: binary columns + typed metadata flow
through Arrow-batched mapInPandas operators with stable schemas and
deterministic (fake-codec) results. The codec itself is a stub — these
tests pin the Spark-side contract a real PIL/ffmpeg swap-in must keep."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nous_spark.operators.multimodal import (
    audio_features,
    decode_image,
    image_features,
    resize_images,
    sample_frames,
    synth_media,
)

N = 30


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, N).cache()


def test_media_table_shape(media):
    assert media.count() == N
    kinds = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    row = media.filter(F.col("media_type") == "image").first()
    assert isinstance(row["content"], (bytes, bytearray))
    assert row["meta"]["format"] == "fimg"


def test_decode_image_matches_meta_and_is_deterministic(media):
    row = media.filter(F.col("media_type") == "image").first()
    px1 = decode_image(bytes(row["content"]))
    px2 = decode_image(bytes(row["content"]))
    assert np.array_equal(px1, px2)
    assert px1.shape == (int(row["meta"]["height"]), int(row["meta"]["width"]), 3)
    assert px1.dtype == np.uint8


def test_decode_strict_raises_not_implemented():
    with pytest.raises((NotImplementedError, ValueError)):
        decode_image(b"\x89PNG\r\n\x1a\nxxxx", strict=True)


def test_image_features_schema_and_values(media):
    feats = image_features(media, n_hist=8)
    rows = feats.collect()
    assert len(rows) == media.filter(F.col("media_type") == "image").count()
    for r in rows:
        assert len(r["features"]) == 3 + 1 + 8
        assert all(0.0 <= h <= 1.0 for h in r["features"][4:])
        assert r["width"] > 0 and r["height"] > 0
    # deterministic across recomputation
    again = {r["media_id"]: r["features"] for r in image_features(media, 8).collect()}
    assert all(again[r["media_id"]] == r["features"] for r in rows)


def test_resize_keeps_schema_updates_meta(media):
    resized = resize_images(media, 8, 8)
    assert resized.schema == media.schema
    for r in resized.collect():
        assert r["meta"]["resized"] == "true"
        px = decode_image(bytes(r["content"]))
        assert px.shape == (8, 8, 3)


def test_sample_frames_explodes_and_frames_decode(media):
    frames = sample_frames(media, every_n=2)
    rows = frames.collect()
    assert rows, "expected at least one video frame"
    n_frames_meta = sum(
        -(-int(r["meta"]["n_frames"]) // 2)
        for r in media.filter(F.col("media_type") == "video").collect()
    )
    assert len(rows) == n_frames_meta
    px = decode_image(bytes(rows[0]["frame"]))
    assert px.ndim == 3 and px.shape[2] == 3
    assert all(r["frame_idx"] % 2 == 0 for r in rows)


def test_audio_features(media):
    rows = audio_features(media).collect()
    assert len(rows) == media.filter(F.col("media_type") == "audio").count()
    for r in rows:
        assert r["duration_sec"] > 0 and r["rms"] > 0 and r["zero_crossings"] > 0
