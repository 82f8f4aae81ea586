"""Multimodal (image/audio/video) column operators.

Media travel as opaque ``binary`` columns with typed metadata structs —
the 100 TB pattern: bytes stay columnar, metadata is queryable, decode happens
executor-side in Arrow batches (SURVEY S8/K5: the reference treats video as
an external blob consumed by OpenCV UDF-style code).

What is REAL here and tested:
- container sniffing + dimension extraction (PNG/JPEG/GIF/WAV) by direct
  byte parsing — no media libraries needed;
- the ``mapInPandas`` plumbing for heavy decode: schema, batch shape,
  partition behavior;
- frame-sampling over a video manifest as a pure DataFrame op.

What is STUBBED (image libs are not in this container): pixel decode falls
back to a clearly-marked deterministic fake (seeded by content hash) so the
downstream plumbing is exercisable; with PIL/OpenCV installed the real decode
path is used unchanged.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "sniff_media_meta",
    "media_meta_column",
    "decode_image_features",
    "decode_audio_features",
    "resize_images",
    "sample_frames",
]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def sniff_media_meta(b: bytes | None) -> tuple[str | None, int | None, int | None, int]:
    """Pure-byte container sniffing: PNG IHDR, JPEG SOF, GIF header, WAV fmt."""
    if b is None:
        return None, None, None, 0
    n = len(b)
    if n >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h, n
    if n >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < n:
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF segments
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", w, h, n
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return "jpeg", None, None, n
    if n >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h, n
    if n >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav", None, None, n
    return "unknown", None, None, n


def media_meta_column(df: DataFrame, binary_col: str, out_col: str = "media_meta") -> DataFrame:
    """Attach a typed metadata struct next to the opaque binary column —
    Arrow-batched pandas UDF (bytes never cross as Python objects row-by-row)."""

    @F.pandas_udf(MEDIA_META_SCHEMA)
    def sniff(series: pd.Series) -> pd.DataFrame:
        rows = [sniff_media_meta(b) for b in series]
        return pd.DataFrame(rows, columns=["format", "width", "height", "n_bytes"])

    return df.withColumn(out_col, sniff(F.col(binary_col)))


IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_image_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    feature_dim: int = 16,
    allow_fake: bool = True,
) -> DataFrame:
    """Decode images and emit a small feature vector per image via
    ``mapInPandas`` (Arrow batches; one task per input partition).

    Real path: PIL decode → grayscale stats + downsampled intensity grid.
    STUB path (no PIL in this environment): a deterministic content-hash
    pseudo-decode, clearly marked, preserving schema/batch behavior.
    """
    try:  # pragma: no cover - exercised only where PIL exists
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil and not allow_fake:
        raise NotImplementedError(
            "image decode requires PIL/OpenCV, which is unavailable; "
            "pass allow_fake=True for the deterministic stub"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                b = row[binary_col]
                if have_pil:
                    import io

                    from PIL import Image

                    img = np.asarray(Image.open(io.BytesIO(b)).convert("L"), dtype=float)
                    luma = float(img.mean())
                    flat = img.flatten()
                    idx = np.linspace(0, len(flat) - 1, feature_dim).astype(int)
                    feat = (flat[idx] / 255.0).astype("float32")
                else:
                    # FAKE DECODE (deterministic): content-hash pseudo pixels
                    digest = hashlib.sha256(b or b"").digest()
                    arr = np.frombuffer(
                        (digest * ((feature_dim * 8) // len(digest) + 1))[: feature_dim * 8],
                        dtype="<u4",
                    ).astype(float)
                    feat = ((arr % 1000) / 1000.0).astype("float32")[:feature_dim]
                    luma = float(feat.mean())
                out.append({"id": row["id"], "mean_luma": luma, "feature": feat.tolist()})
            yield pd.DataFrame(out, columns=["id", "mean_luma", "feature"])

    return df.select(F.col(id_col).alias("id"), F.col(binary_col)).mapInPandas(
        run, IMAGE_FEATURE_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
    ]
)


def _parse_wav_pcm16(b: bytes):
    """RIFF/WAVE parse + PCM16 samples — pure struct/numpy, no media libs.
    Returns (sample_rate, n_channels, samples as float in [-1, 1]) or None."""
    if b is None or len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, sr, nch, bits, data = 12, None, None, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        body = b[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt_code, nch, sr = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_code != 1 or bits != 16:  # PCM16 only
                return None
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or data is None:
        return None
    samples = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(np.float64) / 32768.0
    return sr, nch, samples


def decode_audio_features(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Audio feature extraction over opaque WAV binary columns via
    ``mapInPandas`` — REAL (PCM16 parse is pure struct/numpy): sample rate,
    channel count, duration, RMS, peak, zero-crossing rate. Non-WAV /
    malformed bytes yield null features, not task failures."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, b in zip(pdf["id"], pdf[binary_col]):
                parsed = _parse_wav_pcm16(b)
                if parsed is None or len(parsed[2]) == 0:
                    out.append({"id": rid, "sample_rate": None, "n_channels": None,
                                "duration_s": None, "rms": None, "peak": None,
                                "zero_cross_rate": None})
                    continue
                sr, nch, s = parsed
                zc = float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1]))) if len(s) > 1 else 0.0
                out.append(
                    {
                        "id": rid,
                        "sample_rate": sr,
                        "n_channels": nch,
                        "duration_s": len(s) / nch / sr,
                        "rms": float(np.sqrt(np.mean(s**2))),
                        "peak": float(np.abs(s).max()),
                        "zero_cross_rate": zc,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURE_SCHEMA])

    return df.select(F.col(id_col).alias("id"), F.col(binary_col)).mapInPandas(
        run, AUDIO_FEATURE_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("image", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    width: int,
    height: int,
    allow_fake: bool = True,
) -> DataFrame:
    """Batch image resize via ``mapInPandas`` (the bulk-preprocess step of a
    multimodal training pipeline): binary in → binary out at (width, height).

    Real path: PIL decode → resize → PNG re-encode. STUB path (no PIL in
    this container): a deterministic fake that emits a VALID minimal PNG of
    the target dimensions whose pixel payload derives from the source bytes'
    hash — schema, batch shape, and downstream sniffability are all real."""
    try:  # pragma: no cover - exercised only where PIL exists
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil and not allow_fake:
        raise NotImplementedError(
            "image resize requires PIL/OpenCV, which is unavailable; "
            "pass allow_fake=True for the deterministic stub"
        )

    def fake_png(src: bytes) -> bytes:
        # FAKE RESIZE (deterministic): valid PNG header + IHDR for the target
        # size; payload bytes are a content-hash stream, NOT decoded pixels
        import zlib

        digest = hashlib.sha256(src or b"").digest()
        n_raw = height * (1 + width)  # filter byte + 1 gray byte per pixel
        raw = (digest * (n_raw // len(digest) + 1))[:n_raw]
        def chunk(tag: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )
        ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, b in zip(pdf["id"], pdf[binary_col]):
                if have_pil:
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(b)).resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    data = buf.getvalue()
                else:
                    data = fake_png(b)
                out.append({"id": rid, "image": data, "width": width, "height": height})
            yield pd.DataFrame(out, columns=["id", "image", "width", "height"])

    return df.select(F.col(id_col).alias("id"), F.col(binary_col)).mapInPandas(
        run, RESIZED_SCHEMA
    )


def sample_frames(
    video_index: DataFrame,
    every_n: int | None = None,
    per_second: float | None = None,
    fps: float = 50.0,
    time_col: str = "time",
    frame_col: str = "_frame",
) -> DataFrame:
    """Frame sampling over a video manifest (SURVEY S8): pure DataFrame op —
    select every Nth frame, or quantize to a per-second budget."""
    if (every_n is None) == (per_second is None):
        raise ValueError("pass exactly one of every_n / per_second")
    if every_n is not None:
        return video_index.where(F.col(frame_col) % every_n == 0)
    stride = max(1, int(round(fps / per_second)))
    return video_index.where(F.col(frame_col) % stride == 0)
