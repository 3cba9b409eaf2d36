"""Multimodal tests: binary columns + typed metadata flow through
Arrow-batched mapInPandas operators with stable schemas and
deterministic results. Decode is REAL for BMP/PPM images, PCM-16 WAV
audio, and Y4M video (pure-numpy parsers, exercised on handcrafted
byte layouts below); compressed formats (JPEG/PNG/MP3/MP4) go through
optional-codec import-tries and these tests pin the Spark-side
contract a real PIL/soundfile/PyAV swap-in must keep."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from nous_spark.operators.multimodal import (
    _encode_bmp,
    _encode_ppm,
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
    rows = media.filter(F.col("media_type") == "image").collect()
    assert all(isinstance(r["content"], (bytes, bytearray)) for r in rows)
    # image rows cycle through REAL formats + the fake header
    assert {r["meta"]["format"] for r in rows} == {"bmp", "ppm", "fimg"}
    for r in rows:
        magic = bytes(r["content"])[:2]
        assert magic == {"bmp": b"BM", "ppm": b"P6", "fimg": b"FI"}[r["meta"]["format"]]


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


# -------------------------------------------------------------------------
# REAL decoders: handcrafted byte layouts, not round trips of our encoder
# -------------------------------------------------------------------------
PX_3x2 = np.array(  # w=3 forces BMP row padding (9 -> 12 bytes)
    [
        [[255, 0, 0], [0, 255, 0], [0, 0, 255]],
        [[10, 20, 30], [40, 50, 60], [70, 80, 90]],
    ],
    dtype=np.uint8,
)


def _handcraft_bmp(px: np.ndarray, bpp: int = 24, top_down: bool = False) -> bytes:
    """Independent BMP writer (bottom-up unless top_down, BGR(A), padded
    rows) so the decoder is tested against the SPEC, not _encode_bmp."""
    h, w = px.shape[:2]
    n = bpp // 8
    stride = (w * n + 3) & ~3
    body = b""
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for r in rows:
        row = b""
        for c in range(w):
            bgr = bytes([px[r, c, 2], px[r, c, 1], px[r, c, 0]])
            row += bgr + (b"\xff" if n == 4 else b"")
        body += row + b"\x00" * (stride - len(row))
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, bpp, 0, len(body), 0, 0, 0, 0
    )
    return b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54) + info + body


def test_decode_bmp_24bit_bottom_up_padded():
    assert np.array_equal(decode_image(_handcraft_bmp(PX_3x2)), PX_3x2)


def test_decode_bmp_top_down_and_32bit():
    assert np.array_equal(decode_image(_handcraft_bmp(PX_3x2, top_down=True)), PX_3x2)
    assert np.array_equal(decode_image(_handcraft_bmp(PX_3x2, bpp=32)), PX_3x2)


def test_decode_bmp_truncated_and_compressed_rejected():
    good = _handcraft_bmp(PX_3x2)
    with pytest.raises(ValueError, match="truncated"):
        decode_image(good[:-4])
    rle = bytearray(good)
    rle[30] = 1  # biCompression = BI_RLE8
    with pytest.raises(ValueError, match="unsupported"):
        decode_image(bytes(rle))


def test_decode_ppm_p6_with_comments_and_p3():
    p6 = b"P6\n# a comment\n3 # inline\n2\n255\n" + PX_3x2.tobytes()
    assert np.array_equal(decode_image(p6), PX_3x2)
    p3 = ("P3\n3 2\n255\n" + " ".join(str(v) for v in PX_3x2.flatten())).encode()
    assert np.array_equal(decode_image(p3), PX_3x2)


def test_encoders_round_trip():
    assert np.array_equal(decode_image(_encode_bmp(PX_3x2)), PX_3x2)
    assert np.array_equal(decode_image(_encode_ppm(PX_3x2)), PX_3x2)


def test_decode_wav_handcrafted_stereo_with_extra_chunk():
    """Independent RIFF writer: a LIST chunk before fmt (odd-sized, so
    the word-alignment pad is exercised), stereo 16-bit PCM — decoder
    must walk chunks, average channels, and scale to [-1, 1)."""
    from nous_spark.operators.multimodal import decode_audio

    left = np.array([0, 16384, -16384, 32767], dtype=np.int16)
    right = np.array([0, 0, -16384, 32767], dtype=np.int16)
    inter = np.empty(8, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    body = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd + pad
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", inter.nbytes) + inter.tobytes()
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    samples, rate = decode_audio(wav)
    assert rate == 8000 and samples.dtype == np.float32
    expected = (left.astype(np.float64) + right) / 2 / 32768.0
    assert np.allclose(samples, expected, atol=1e-7)


def test_wav_round_trip_and_audio_features_from_real_bytes(media):
    from nous_spark.operators.multimodal import _encode_wav, decode_audio

    sig = np.sin(np.linspace(0, 20 * np.pi, 1600)).astype(np.float32) * 0.5
    got, rate = decode_audio(_encode_wav(sig, 16000))
    assert rate == 16000
    assert np.allclose(got, sig, atol=1.0 / 32768)  # int16 quantization
    # the Spark operator's rms for a real-WAV row matches local decode
    row = next(
        r
        for r in media.filter(F.col("media_type") == "audio").collect()
        if r["meta"]["format"] == "wav"
    )
    samples, rate = decode_audio(bytes(row["content"]))
    feats = (
        audio_features(media).filter(F.col("media_id") == row["media_id"]).first()
    )
    assert feats["rms"] == pytest.approx(float(np.sqrt((samples**2).mean())), rel=1e-6)
    assert feats["duration_sec"] == pytest.approx(len(samples) / rate, rel=1e-9)


def test_image_features_come_from_real_pixels(media):
    """The Spark operator's features for a BMP row must equal stats of
    the ACTUAL decoded pixels (not the fake-codec fallback)."""
    row = next(
        r
        for r in media.filter(F.col("media_type") == "image").collect()
        if r["meta"]["format"] == "bmp"
    )
    px = decode_image(bytes(row["content"]))
    feats = (
        image_features(media, n_hist=8)
        .filter(F.col("media_id") == row["media_id"])
        .first()
    )
    assert feats["width"] == px.shape[1] and feats["height"] == px.shape[0]
    for c in range(3):
        assert feats["features"][c] == pytest.approx(float(px[..., c].mean()), rel=1e-6)


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


# ---------------------------------------------------------------------------
# REAL Y4M video decode (round 4)
# ---------------------------------------------------------------------------
def test_y4m_c444_round_trip_near_lossless():
    """C444 stores full-resolution planes: the only loss is BT.601
    quantization, bounded at <=2 levels per channel."""
    from nous_spark.operators.multimodal import _decode_video_y4m, _encode_y4m

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (4, 24, 32, 3), dtype=np.uint8)
    dec, fps = _decode_video_y4m(_encode_y4m(px, "C444", fps=(30, 1)))
    assert dec.shape == px.shape and fps == 30.0
    assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 2


def test_y4m_c420_and_mono_layouts():
    """C420 carries quarter-size chroma planes (smooth regions survive
    the subsample+replicate round trip); Cmono carries luma only."""
    from nous_spark.operators.multimodal import (
        _decode_video_y4m,
        _encode_y4m,
        _rgb_to_yuv,
    )

    # constant-color frames: chroma is flat, so 2x2 subsampling is exact
    px = np.full((2, 16, 16, 3), (200, 40, 90), dtype=np.uint8)
    dec, _ = _decode_video_y4m(_encode_y4m(px, "C420jpeg"))
    assert dec.shape == px.shape
    assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 2
    # hand-built Cmono stream
    gray = _rgb_to_yuv(px[0])[..., 0]
    mono = b"YUV4MPEG2 W16 H16 F25:1 Cmono\n" + b"FRAME\n" + gray.tobytes()
    dmono, _ = _decode_video_y4m(mono)
    assert dmono.shape == (1, 16, 16, 3)
    # R==G==B per pixel (U=V=128 -> gray), close to the luma
    assert (dmono[0, ..., 0] == dmono[0, ..., 1]).all()
    assert (dmono[0, ..., 1] == dmono[0, ..., 2]).all()


def test_y4m_malformed_payloads_raise():
    from nous_spark.operators.multimodal import _decode_video_y4m

    with pytest.raises(ValueError):  # missing W/H
        _decode_video_y4m(b"YUV4MPEG2 F25:1\nFRAME\n")
    with pytest.raises(ValueError):  # truncated frame payload
        _decode_video_y4m(b"YUV4MPEG2 W4 H4 C444\nFRAME\n" + b"\x00" * 10)
    with pytest.raises(ValueError):  # bad frame marker
        _decode_video_y4m(b"YUV4MPEG2 W2 H2 C444\nBOGUS\n" + b"\x00" * 12)


def test_decode_video_dispatch_and_strict():
    """FVID -> fake frames; Y4M -> real; unknown container -> strict
    NotImplementedError naming the optional dependency (PyAV)."""
    from nous_spark.operators.multimodal import (
        _fake_video_bytes,
        decode_video,
    )

    frames, fps = decode_video(_fake_video_bytes(9, 3, 8, 6))
    assert frames.shape == (3, 6, 8, 3) and fps == 25.0
    with pytest.raises(NotImplementedError, match="PyAV"):
        decode_video(b"\x00\x00\x00 ftypmp42----", strict=True)
    with pytest.raises(ValueError):
        decode_video(b"\x00\x00\x00 ftypmp42----", strict=False)


def test_decode_image_strict_names_pil():
    """The strict-mode error for compressed images names the optional
    dependency (PIL) — the README's real-corpus JPEG/PNG note is backed
    by a discoverable error message."""
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG\r\n\x1a\nxxxx", strict=True)


def test_unsupported_wav_falls_through_with_context():
    """A float-format WAV (format tag 3) is beyond the pure-numpy PCM-16
    parser; without soundfile installed the error carries the original
    unsupported-variant context instead of claiming the payload is
    unrecognized (advisor finding: the fallback was unreachable)."""
    from nous_spark.operators.multimodal import decode_audio

    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)  # IEEE float
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 8) + b"\x00" * 8
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_audio(wav)
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio(wav, strict=True)


def test_frame_features_on_mixed_real_and_fake_videos(spark):
    """frame_features over sample_frames: Y4M rows decode genuinely
    (BMP-re-encoded frames), FVID rows ride the fake codec; every
    sampled frame of every video yields exactly one feature row with
    the video's frame geometry."""
    from nous_spark.operators.multimodal import frame_features

    media = synth_media(spark, N)
    vids = media.filter(F.col("media_type") == "video")
    fmts = {r["meta"]["format"] for r in vids.collect()}
    assert fmts == {"y4m", "fvid"}  # both payload kinds present
    out = frame_features(sample_frames(media, every_n=2), n_hist=8).collect()
    expected = sum(
        -(-int(r["meta"]["n_frames"]) // 2) for r in vids.collect()
    )
    assert len(out) == expected
    assert all(r["width"] == 32 and r["height"] == 24 for r in out)
    assert all(len(r["features"]) == 12 for r in out)
