"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media alongside text. The engine
treats media as ``binary`` columns with a ``map<string,string>`` metadata
column; decode / feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` operators so the heavy bytes never round-trip through
driver or JVM row objects.

The actual codec step is STUBBED: PIL/librosa/ffmpeg are not in this
container. Each operator first tries the real library (import-try); when
absent it either raises ``NotImplementedError`` (``strict=True``) or
falls back to the deterministic FAKE codec below — a self-describing
binary format (``synth_media`` generates it) that lets every piece of
Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) be real and tested. Swapping in a real codec changes ONLY the
``_decode_*_real`` functions.

Scale notes: media rows are large — keep
``spark.sql.files.maxPartitionBytes`` low (128 MB) so a partition of
binaries fits executor memory; feature extraction is map-only (no
shuffle); frame sampling explodes rows, so repartition by media_id after
it if a downstream groupBy follows.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_IMG_MAGIC = b"FIMG"
_AUD_MAGIC = b"FAUD"
_VID_MAGIC = b"FVID"


# ---------------------------------------------------------------------------
# deterministic fake codec (the test stand-in for PIL/librosa/ffmpeg)
# ---------------------------------------------------------------------------
def _fake_image_bytes(media_id: int, width: int, height: int) -> bytes:
    return _IMG_MAGIC + struct.pack("<IIQ", width, height, media_id)


def _fake_audio_bytes(media_id: int, n_samples: int, rate: int) -> bytes:
    return _AUD_MAGIC + struct.pack("<IIQ", n_samples, rate, media_id)


def _fake_video_bytes(media_id: int, n_frames: int, width: int, height: int) -> bytes:
    return _VID_MAGIC + struct.pack("<IIIQ", n_frames, width, height, media_id)


def _decode_image_fake(content: bytes) -> np.ndarray:
    """FAKE decode: (h, w, 3) uint8 pixels derived deterministically from
    the header seed. Replace with PIL.Image.open for real data."""
    if not content.startswith(_IMG_MAGIC):
        raise ValueError("not a FIMG payload")
    w, h, seed = struct.unpack("<IIQ", content[4:20])
    rng = np.random.RandomState(zlib.crc32(struct.pack("<Q", seed)) & 0x7FFFFFFF)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _decode_audio_fake(content: bytes) -> tuple[np.ndarray, int]:
    if not content.startswith(_AUD_MAGIC):
        raise ValueError("not a FAUD payload")
    n, rate, seed = struct.unpack("<IIQ", content[4:20])
    rng = np.random.RandomState(zlib.crc32(struct.pack("<Q", seed + 1)) & 0x7FFFFFFF)
    return rng.standard_normal(n).astype(np.float32), rate


def decode_image(content: bytes, strict: bool = False) -> np.ndarray:
    """Decode an image binary to an (h, w, 3) array.

    Real path (PIL) when available; otherwise the deterministic fake
    codec, or ``NotImplementedError`` when ``strict`` and the payload is
    a real format we cannot decode here.
    """
    if content.startswith(_IMG_MAGIC):
        return _decode_image_fake(content)
    try:
        from PIL import Image  # noqa: F401  (absent in this container)
        import io

        return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))
    except ImportError as exc:
        if strict:
            raise NotImplementedError(
                "real image decode requires PIL, which is not installed"
            ) from exc
        raise ValueError("unrecognized image payload and PIL unavailable") from exc


# ---------------------------------------------------------------------------
# synthetic media table
# ---------------------------------------------------------------------------
def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table: round-robin image/audio/video rows with
    sizes derived from (index, seed). Distributed generation via range."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.RandomState((seed << 16) ^ i)
                kind = ("image", "audio", "video")[i % 3]
                if kind == "image":
                    w, h = 16 + rng.randint(0, 48), 16 + rng.randint(0, 48)
                    content = _fake_image_bytes(i, w, h)
                    meta = {"width": str(w), "height": str(h), "format": "fimg"}
                elif kind == "audio":
                    ns, rate = 1000 + rng.randint(0, 8000), 16000
                    content = _fake_audio_bytes(i, ns, rate)
                    meta = {"n_samples": str(ns), "rate": str(rate), "format": "faud"}
                else:
                    nf, w, h = 4 + rng.randint(0, 12), 32, 24
                    content = _fake_video_bytes(i, nf, w, h)
                    meta = {"n_frames": str(nf), "width": str(w), "height": str(h), "format": "fvid"}
                rows.append(
                    {
                        "media_id": i,
                        "url": f"https://example.org/media/{i:08d}",
                        "media_type": kind,
                        "content": content,
                        "meta": meta,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    par = spark.sparkContext.defaultParallelism
    return spark.range(n, numPartitions=max(par, 1)).mapInPandas(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# operators (all mapInPandas — Arrow-batched, map-only)
# ---------------------------------------------------------------------------
IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, features array<float>"
)


def image_features(media: DataFrame, n_hist: int = 8) -> DataFrame:
    """Per-image features: (width, height, [mean_r, mean_g, mean_b,
    std_gray, hist_0..hist_{n-1}]). Decode happens inside the executor
    batch loop; only the small feature vector is returned."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = decode_image(bytes(content))
                gray = px.mean(axis=2)
                hist, _ = np.histogram(gray, bins=n_hist, range=(0, 256))
                hist = hist / max(1, gray.size)
                feats = (
                    [float(px[..., c].mean()) for c in range(3)]
                    + [float(gray.std())]
                    + [float(x) for x in hist]
                )
                out.append(
                    {
                        "media_id": int(mid),
                        "width": int(px.shape[1]),
                        "height": int(px.shape[0]),
                        "features": feats,
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "features"])

    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "content")
        .mapInPandas(gen, IMAGE_FEATURES_SCHEMA)
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """'Resize' images: decode -> nearest-neighbor subsample -> re-encode.

    With the fake codec the re-encode just rewrites the header (pixels
    are seed-derived); the plumbing — binary in, binary out, meta
    updated — is exactly what a PIL-backed version would do.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            contents, metas = [], []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                decode_image(bytes(content))  # validates payload
                contents.append(_fake_image_bytes(int(mid), width, height))
                m = dict(meta or {})
                m.update({"width": str(width), "height": str(height), "resized": "true"})
                metas.append(m)
            out["content"] = contents
            out["meta"] = metas
            yield out

    return (
        media.filter(F.col("media_type") == "image")
        .mapInPandas(gen, media.schema)
    )


FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary"


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Explode videos into every-nth-frame rows (media_id, frame_idx,
    frame) — each frame re-encoded as a standalone fake image whose seed
    mixes (video id, frame idx), so downstream image ops apply to it."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                content = bytes(content)
                if not content.startswith(_VID_MAGIC):
                    raise ValueError("not a FVID payload")
                nf, w, h, seed = struct.unpack("<IIIQ", content[4:24])
                for fi in range(0, nf, every_n):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": fi,
                            "frame": _fake_image_bytes((int(seed) << 8) | fi, w, h),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", "content")
        .mapInPandas(gen, FRAMES_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = "media_id long, duration_sec double, rms double, zero_crossings long"


def audio_features(media: DataFrame) -> DataFrame:
    """Per-clip audio features: duration, RMS energy, zero-crossing count."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                samples, rate = _decode_audio_fake(bytes(content))
                zc = int(((samples[:-1] * samples[1:]) < 0).sum())
                out.append(
                    {
                        "media_id": int(mid),
                        "duration_sec": float(len(samples) / rate),
                        "rms": float(np.sqrt((samples**2).mean())),
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "duration_sec", "rms", "zero_crossings"]
            )

    return (
        media.filter(F.col("media_type") == "audio")
        .select("media_id", "content")
        .mapInPandas(gen, AUDIO_FEATURES_SCHEMA)
    )
