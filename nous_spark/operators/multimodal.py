"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media alongside text. The engine
treats media as ``binary`` columns with a ``map<string,string>`` metadata
column; decode / feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` operators so the heavy bytes never round-trip through
driver or JVM row objects.

Image decode is REAL for BMP (24/32-bit uncompressed, bottom-up and
top-down) and PPM (P6 binary / P3 ascii), audio decode is REAL for
WAV (RIFF chunk walk, 16-bit PCM, any channel count), and video decode
is REAL for Y4M / YUV4MPEG2 (header tag walk, FRAME markers, planar
C444/C420*/Cmono layouts, BT.601 YUV->RGB): pure-numpy header+sample
parsers below, no external codec needed — ``synth_media`` emits genuine
BMP/PPM/WAV/Y4M payloads alongside the fake formats, and the feature
operators compute from the actual bytes. Compressed formats
(JPEG/PNG/MP3/OGG/MP4) still go through an import-try for
PIL/soundfile/PyAV (absent in this container): ``strict=True`` raises
``NotImplementedError``; otherwise the deterministic FAKE codec keeps
the Spark-side plumbing (schema, partitioning, UDF signature, Arrow
batch shape) testable.

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


# ---------------------------------------------------------------------------
# REAL decoders: BMP + PPM images, WAV audio — pure numpy, no external codec
# ---------------------------------------------------------------------------
def _decode_audio_wav(content: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE file (PCM, 16-bit) to (mono float32 samples in
    [-1, 1), sample_rate). Full chunk walk: 'RIFF' size 'WAVE', then
    chunks until 'fmt ' (audio_format 1 = PCM, n_channels, sample_rate,
    bits_per_sample) and 'data' are found; chunks are word-aligned
    (odd-sized chunks carry a pad byte). Multi-channel input is
    mono-ized by averaging channels."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content) and (fmt is None or data is None):
        cid = content[pos : pos + 4]
        size = struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16 or n_channels < 1:
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits}, ch={n_channels})"
        )
    n = len(data) // (2 * n_channels)
    if n == 0:
        return np.zeros(0, dtype=np.float32), int(sample_rate)
    pcm = np.frombuffer(data, dtype="<i2", count=n * n_channels)
    samples = pcm.reshape(n, n_channels).mean(axis=1) / 32768.0
    return samples.astype(np.float32), int(sample_rate)


def _encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode mono float32 [-1, 1) samples as a 16-bit PCM WAV — used by
    synth_media and tests to produce REAL audio payloads."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64) * 32768.0, -32768, 32767)
    data = pcm.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_audio(content: bytes, strict: bool = False) -> tuple[np.ndarray, int]:
    """Decode an audio binary to (mono float32 samples, rate). WAV
    decodes FOR REAL (pure numpy, above); FAUD is the deterministic
    fake; anything else (mp3/ogg/...) needs an optional codec —
    ``NotImplementedError`` under ``strict`` when absent."""
    if content.startswith(_AUD_MAGIC):
        return _decode_audio_fake(content)
    wav_err: ValueError | None = None
    if content[:4] == b"RIFF":
        try:
            return _decode_audio_wav(content)
        except ValueError as exc:
            # float/24-bit WAV or a RIFF non-WAVE container: the strict
            # pure-numpy parser can't take it, but soundfile (when
            # installed) can — fall through instead of raising here
            wav_err = exc
    try:
        import soundfile  # noqa: F401  (absent in this container)
        import io

        data, rate = soundfile.read(io.BytesIO(content), dtype="float32")
        if data.ndim > 1:
            data = data.mean(axis=1)
        return data.astype(np.float32), int(rate)
    except ImportError as exc:
        if strict:
            raise NotImplementedError(
                "real audio decode requires soundfile, which is not installed"
            ) from exc
        if wav_err is not None:
            raise ValueError(f"{wav_err} (and soundfile unavailable)") from wav_err
        raise ValueError("unrecognized audio payload and soundfile unavailable") from exc


# ---------------------------------------------------------------------------
# REAL video decode: Y4M (YUV4MPEG2) — pure numpy, no external codec
# ---------------------------------------------------------------------------
# full-range BT.601 RGB<->YUV — the standard Y4M payload interpretation
_YUV_FWD = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ]
)
_YUV_INV = np.array([[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]])


def _rgb_to_yuv(px: np.ndarray) -> np.ndarray:
    yuv = px.astype(np.float64) @ _YUV_FWD.T
    yuv[..., 1:] += 128.0
    return np.clip(np.round(yuv), 0, 255).astype(np.uint8)


def _yuv_to_rgb(yuv: np.ndarray) -> np.ndarray:
    f = yuv.astype(np.float64)
    f[..., 1:] -= 128.0
    return np.clip(np.round(f @ _YUV_INV.T), 0, 255).astype(np.uint8)


def _encode_y4m(
    frames: np.ndarray, colorspace: str = "C444", fps: tuple[int, int] = (25, 1)
) -> bytes:
    """Encode (n, h, w, 3) RGB uint8 frames as a YUV4MPEG2 stream —
    used by synth_media and tests to produce REAL video payloads.
    ``C444`` stores full-resolution planes; ``C420jpeg`` subsamples
    chroma 2x2 (box average) — both per the y4m spec's plain
    uncompressed planar layout."""
    n, h, w = frames.shape[:3]
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n"
    out = [header.encode("ascii")]
    for i in range(n):
        yuv = _rgb_to_yuv(frames[i])
        out.append(b"FRAME\n")
        out.append(yuv[..., 0].tobytes())
        for c in (1, 2):
            plane = yuv[..., c]
            if colorspace.startswith("C420"):
                plane = (
                    plane.astype(np.uint32)
                    .reshape(h // 2, 2, w // 2, 2)
                    .mean(axis=(1, 3))
                    .round()
                    .astype(np.uint8)
                )
            out.append(plane.tobytes())
    return b"".join(out)


def _decode_video_y4m(content: bytes) -> tuple[np.ndarray, float]:
    """Parse a YUV4MPEG2 stream to ((n, h, w, 3) RGB uint8 frames, fps).

    Real header walk: the stream header's space-separated W/H/F/C
    parameter tagging, then one ``FRAME[params]\\n`` marker per frame
    followed by raw planar YUV. Colorspaces: C444 (full-res planes),
    C420/C420jpeg/C420mpeg2/C420paldv (2x2-subsampled chroma, upsampled
    by replication), Cmono (luma only). Other colorspaces raise — the
    caller's optional-codec fallback takes them."""
    nl = content.find(b"\n")
    if nl < 0 or not content.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps = 25.0
    cs = "C420"  # spec default when the C tag is absent
    for tok in content[:nl].decode("ascii", "replace").split(" ")[1:]:
        if not tok:
            continue
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps = int(num) / max(1, int(den))
        elif tok[0] == "C":
            cs = tok
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if cs.startswith("C444"):
        plane_shapes = [(h, w), (h, w), (h, w)]
    elif cs.startswith("C420"):
        plane_shapes = [(h, w), (h // 2, w // 2), (h // 2, w // 2)]
    elif cs.startswith("Cmono"):
        plane_shapes = [(h, w)]
    else:
        raise ValueError(f"unsupported Y4M colorspace {cs}")
    frame_bytes = sum(ph * pw for ph, pw in plane_shapes)
    pos, frames = nl + 1, []
    while pos < len(content):
        fnl = content.find(b"\n", pos)
        if fnl < 0 or not content[pos : pos + 5] == b"FRAME":
            raise ValueError("malformed Y4M FRAME marker")
        pos = fnl + 1
        if len(content) < pos + frame_bytes:
            raise ValueError("truncated Y4M frame payload")
        planes = []
        for ph, pw in plane_shapes:
            planes.append(
                np.frombuffer(content, np.uint8, ph * pw, pos).reshape(ph, pw)
            )
            pos += ph * pw
        if cs.startswith("Cmono"):
            yuv = np.stack(
                [planes[0], np.full((h, w), 128, np.uint8), np.full((h, w), 128, np.uint8)],
                axis=-1,
            )
        else:
            up = [
                p if p.shape == (h, w) else p.repeat(2, axis=0).repeat(2, axis=1)
                for p in planes
            ]
            yuv = np.stack(up, axis=-1)
        frames.append(_yuv_to_rgb(yuv))
    return np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8), fps


def _decode_video_fake(content: bytes) -> tuple[np.ndarray, float]:
    """FAKE video decode: each frame is the fake image codec's
    deterministic pixels for seed (media_id << 8) | frame_idx — the same
    mixing sample_frames has always used for FVID payloads."""
    if not content.startswith(_VID_MAGIC):
        raise ValueError("not a FVID payload")
    nf, w, h, seed = struct.unpack("<IIIQ", content[4:24])
    frames = [
        _decode_image_fake(_fake_image_bytes((int(seed) << 8) | fi, w, h))
        for fi in range(nf)
    ]
    return np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8), 25.0


def decode_video(content: bytes, strict: bool = False) -> tuple[np.ndarray, float]:
    """Decode a video binary to ((n_frames, h, w, 3) RGB uint8, fps).
    Y4M decodes FOR REAL (pure numpy, above); FVID is the deterministic
    fake; anything else (mp4/webm/...) needs an optional demuxer —
    ``NotImplementedError`` under ``strict`` when absent."""
    if content.startswith(_VID_MAGIC):
        return _decode_video_fake(content)
    y4m_err: ValueError | None = None
    if content.startswith(b"YUV4MPEG2"):
        try:
            return _decode_video_y4m(content)
        except ValueError as exc:
            y4m_err = exc  # exotic colorspace: try the optional demuxer
    try:
        import av  # noqa: F401  (absent in this container)
        import io

        try:
            with av.open(io.BytesIO(content)) as container:
                stream = container.streams.video[0]
                frames = [
                    f.to_ndarray(format="rgb24") for f in container.decode(stream)
                ]
                fps = float(stream.average_rate or 25.0)
        except Exception as exc:  # av failure: keep the Y4M context
            if y4m_err is not None:
                raise ValueError(f"{y4m_err} (PyAV also failed: {exc})") from exc
            raise
        if not frames:  # zero-frame container: mirror the Y4M/FVID shape
            h = int(getattr(stream, "height", 0) or 0)
            w = int(getattr(stream, "width", 0) or 0)
            return np.zeros((0, h, w, 3), np.uint8), fps
        return np.stack(frames), fps
    except ImportError as exc:
        if strict:
            raise NotImplementedError(
                "real video decode requires PyAV (av), which is not installed"
            ) from exc
        if y4m_err is not None:
            raise ValueError(f"{y4m_err} (and PyAV unavailable)") from y4m_err
        raise ValueError("unrecognized video payload and PyAV unavailable") from exc


def _decode_image_bmp(content: bytes) -> np.ndarray:
    """Parse an uncompressed 24/32-bit BI_RGB BMP to (h, w, 3) RGB uint8.

    Full header walk: BITMAPFILEHEADER (14 bytes, pixel-data offset at
    byte 10) + BITMAPINFOHEADER (biWidth, biHeight — negative means
    top-down, biBitCount, biCompression). Rows are BGR(A), padded to a
    4-byte boundary, stored bottom-up unless height < 0.
    """
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    px_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if planes != 1 or compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP (planes={planes}, bpp={bpp}, compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    bytes_px = bpp // 8
    stride = (width * bytes_px + 3) & ~3
    need = px_off + stride * height
    if len(content) < need:
        raise ValueError(f"truncated BMP: {len(content)} < {need} bytes")
    raw = np.frombuffer(content, dtype=np.uint8, count=stride * height, offset=px_off)
    rows = raw.reshape(height, stride)[:, : width * bytes_px]
    px = rows.reshape(height, width, bytes_px)
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px[..., 2::-1])  # BGR(A) -> RGB, alpha dropped


def _decode_image_ppm(content: bytes) -> np.ndarray:
    """Parse a PPM (P6 binary or P3 ascii, maxval <= 255) to (h, w, 3)
    RGB uint8. Header tokens may be separated by any whitespace and
    interleaved with '#' comments (the netpbm spec)."""
    if content[:2] not in (b"P6", b"P3"):
        raise ValueError("not a PPM payload")
    binary = content[:2] == b"P6"
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(content):
            raise ValueError("truncated PPM header")
        c = content[pos : pos + 1]
        if c == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(content) and not content[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(content[start:pos]))
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError(f"16-bit PPM unsupported (maxval={maxval})")
    n = width * height * 3
    if binary:
        pos += 1  # exactly one whitespace byte after maxval, per spec
        if len(content) < pos + n:
            raise ValueError(f"truncated PPM: {len(content)} < {pos + n} bytes")
        px = np.frombuffer(content, dtype=np.uint8, count=n, offset=pos)
    else:
        vals = content[pos:].split()
        if len(vals) < n:
            raise ValueError(f"truncated P3 PPM: {len(vals)} < {n} samples")
        px = np.array([int(v) for v in vals[:n]], dtype=np.uint8)
    return px.reshape(height, width, 3)


def _encode_bmp(px: np.ndarray) -> bytes:
    """Encode (h, w, 3) RGB uint8 as a 24-bit bottom-up BMP — used by
    synth_media and tests to produce REAL image payloads."""
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, RGB->BGR
    data = rows.tobytes()
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    )
    return header + data


def _encode_ppm(px: np.ndarray) -> bytes:
    """Encode (h, w, 3) RGB uint8 as binary P6 PPM."""
    h, w = px.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + px.astype(np.uint8).tobytes()


def decode_image(content: bytes, strict: bool = False) -> np.ndarray:
    """Decode an image binary to an (h, w, 3) RGB uint8 array.

    BMP and PPM decode FOR REAL (pure numpy, above); the deterministic
    fake codec handles FIMG; anything else (JPEG/PNG/...) needs PIL —
    ``NotImplementedError`` under ``strict`` when it is absent.
    """
    if content.startswith(_IMG_MAGIC):
        return _decode_image_fake(content)
    np_err: ValueError | None = None
    if content[:2] == b"BM" or content[:2] in (b"P6", b"P3"):
        try:
            if content[:2] == b"BM":
                return _decode_image_bmp(content)
            return _decode_image_ppm(content)
        except ValueError as exc:
            # unsupported variant (RLE/8-bit BMP, 16-bit PPM): PIL can
            # take those when installed — fall through instead of raising
            np_err = exc
    try:
        from PIL import Image  # noqa: F401  (absent in this container)
        import io

        return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))
    except ImportError as exc:
        if strict:
            raise NotImplementedError(
                "real image decode requires PIL, which is not installed"
            ) from exc
        if np_err is not None:
            raise ValueError(f"{np_err} (and PIL unavailable)") from np_err
        raise ValueError("unrecognized image payload and PIL unavailable") from exc


# ---------------------------------------------------------------------------
# synthetic media table
# ---------------------------------------------------------------------------
def synth_media_row(i: int, seed: int = 42) -> dict:
    """One deterministic media row for index ``i`` — the single source of
    truth for synth_media's generation, shared with the generated
    media_image_features DuckDB oracle (__spark_entry__) so the Spark
    table and the oracle's expected values can never drift."""
    rng = np.random.RandomState((seed << 16) ^ i)
    kind = ("image", "audio", "video")[i % 3]
    if kind == "image":
        w, h = 16 + rng.randint(0, 48), 16 + rng.randint(0, 48)
        fmt = ("bmp", "ppm", "fimg")[(i // 3) % 3]
        if fmt == "bmp":
            content = _encode_bmp(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
        elif fmt == "ppm":
            content = _encode_ppm(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
        else:
            content = _fake_image_bytes(i, w, h)
        meta = {"width": str(w), "height": str(h), "format": fmt}
    elif kind == "audio":
        ns, rate = 1000 + rng.randint(0, 8000), 16000
        fmt = ("wav", "faud")[(i // 3) % 2]
        if fmt == "wav":
            content = _encode_wav(rng.standard_normal(ns).astype(np.float32) * 0.25, rate)
        else:
            content = _fake_audio_bytes(i, ns, rate)
        meta = {"n_samples": str(ns), "rate": str(rate), "format": fmt}
    else:
        nf, w, h = 4 + rng.randint(0, 12), 32, 24
        fmt = ("y4m", "fvid")[(i // 3) % 2]
        if fmt == "y4m":
            # REAL Y4M payload: deterministic pixels, colorspace
            # alternating C444 / C420jpeg so both plane layouts are
            # exercised end to end
            cs = ("C444", "C420jpeg")[(i // 6) % 2]
            pixels = rng.randint(0, 256, (nf, h, w, 3), dtype=np.uint8)
            content = _encode_y4m(pixels, colorspace=cs)
        else:
            content = _fake_video_bytes(i, nf, w, h)
        meta = {"n_frames": str(nf), "width": str(w), "height": str(h), "format": fmt}
    return {
        "media_id": i,
        "url": f"https://example.org/media/{i:08d}",
        "media_type": kind,
        "content": content,
        "meta": meta,
    }


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table: round-robin image/audio/video rows with
    sizes derived from (index, seed). Distributed generation via range.

    Image rows cycle through REAL formats — BMP (24-bit), P6 PPM — and
    the fake FIMG header, all carrying deterministically generated
    pixels, so image operators downstream exercise the real decoders on
    genuine byte layouts (row padding, bottom-up order, header walks),
    not just the stub."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [synth_media_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    par = spark.sparkContext.defaultParallelism
    return spark.range(n, numPartitions=max(par, 1)).mapInPandas(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# operators (all mapInPandas — Arrow-batched, map-only)
# ---------------------------------------------------------------------------
IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, features array<float>"
)


def image_feature_stats(content: bytes, n_hist: int = 8) -> tuple[int, int, list[float]]:
    """Pure per-image feature math: (width, height, [mean_r, mean_g,
    mean_b, std_gray, hist_0..hist_{n-1}]) — shared by the Spark
    operator and the generated oracle's expected-value computation."""
    px = decode_image(content)
    gray = px.mean(axis=2)
    hist, _ = np.histogram(gray, bins=n_hist, range=(0, 256))
    hist = hist / max(1, gray.size)
    feats = (
        [float(px[..., c].mean()) for c in range(3)]
        + [float(gray.std())]
        + [float(x) for x in hist]
    )
    return int(px.shape[1]), int(px.shape[0]), feats


def image_features(media: DataFrame, n_hist: int = 8) -> DataFrame:
    """Per-image features via ``image_feature_stats``. Decode happens
    inside the executor batch loop; only the small feature vector is
    returned."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, feats = image_feature_stats(bytes(content), n_hist)
                out.append(
                    {"media_id": int(mid), "width": w, "height": h, "features": feats}
                )
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "features"])

    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "content")
        .mapInPandas(gen, IMAGE_FEATURES_SCHEMA)
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize images FOR REAL: decode -> nearest-neighbor resample ->
    re-encode as 24-bit BMP (binary in, binary out, meta updated).

    Nearest-neighbor in pure numpy (index sampling) — works identically
    for real BMP/PPM payloads and the fake codec's seed-derived pixels.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            contents, metas = [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                px = decode_image(bytes(content))
                ri = np.minimum(
                    (np.arange(height) * px.shape[0] / height).astype(int),
                    px.shape[0] - 1,
                )
                ci = np.minimum(
                    (np.arange(width) * px.shape[1] / width).astype(int),
                    px.shape[1] - 1,
                )
                contents.append(_encode_bmp(px[np.ix_(ri, ci)]))
                m = dict(meta or {})
                m.update(
                    {
                        "width": str(width),
                        "height": str(height),
                        "resized": "true",
                        "format": "bmp",
                    }
                )
                metas.append(m)
            out["content"] = contents
            out["meta"] = metas
            yield out

    return (
        media.filter(F.col("media_type") == "image")
        .mapInPandas(gen, media.schema)
    )


FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary"


def sampled_frame_bytes(content: bytes, every_n: int = 2) -> list[tuple[int, bytes]]:
    """Pure per-video frame sampling: every-nth frame as standalone
    image bytes. Y4M frames decode FOR REAL and re-encode as 24-bit BMP
    (so downstream image operators run the real decoder on them); FVID
    frames stay the fake image codec's seed-mixed header (cheap — no
    pixel materialization for the fake path). Shared by the Spark
    operator and the generated media_video_features oracle, which pins
    this function's outputs as VALUES — operator and oracle cannot
    drift."""
    if content.startswith(_VID_MAGIC):
        nf, w, h, seed = struct.unpack("<IIIQ", content[4:24])
        return [
            (fi, _fake_image_bytes((int(seed) << 8) | fi, w, h))
            for fi in range(0, nf, every_n)
        ]
    frames, _ = decode_video(content)
    return [(fi, _encode_bmp(frames[fi])) for fi in range(0, len(frames), every_n)]


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Explode videos into every-nth-frame rows (media_id, frame_idx,
    frame), each frame a standalone image binary — REAL BMP for decoded
    Y4M frames, the fake image header for FVID — so downstream image
    ops apply to it."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for fi, frame in sampled_frame_bytes(bytes(content), every_n):
                    rows.append({"media_id": int(mid), "frame_idx": fi, "frame": frame})
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", "content")
        .mapInPandas(gen, FRAMES_SCHEMA)
    )


def frame_features(frames: DataFrame, n_hist: int = 8) -> DataFrame:
    """Per-frame image features over a sample_frames output — the video
    analog of image_features, reusing the same pure feature math."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, fi, frame in zip(pdf["media_id"], pdf["frame_idx"], pdf["frame"]):
                w, h, feats = image_feature_stats(bytes(frame), n_hist)
                out.append(
                    {
                        "media_id": int(mid),
                        "frame_idx": int(fi),
                        "width": w,
                        "height": h,
                        "features": feats,
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "width", "height", "features"]
            )

    return frames.select("media_id", "frame_idx", "frame").mapInPandas(
        gen, "media_id long, frame_idx int, width int, height int, features array<float>"
    )


AUDIO_FEATURES_SCHEMA = "media_id long, duration_sec double, rms double, zero_crossings long"


def audio_features(media: DataFrame) -> DataFrame:
    """Per-clip audio features: duration, RMS energy, zero-crossing count."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                samples, rate = decode_audio(bytes(content))
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
