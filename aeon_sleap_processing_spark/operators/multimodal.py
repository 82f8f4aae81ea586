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

What is REAL without any media library: PNG decode/encode (``decode_png``/
``encode_png``) — PNG is zlib (stdlib) + five per-scanline byte filters, so
8-bit grayscale/RGB PNGs round-trip in pure numpy. ``decode_image_features``
and ``resize_images`` use it whenever the input IS a PNG; PIL (if installed)
handles other containers; only non-PNG-without-PIL falls back to the
clearly-marked deterministic fake (seeded by content hash) so the downstream
plumbing stays exercisable.
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
    "decode_png",
    "encode_png",
    "decode_avi",
    "encode_avi",
    "decode_image_features",
    "decode_audio_features",
    "resize_images",
    "video_frame_source",
    "sample_frames",
    "image_pixel_stats",
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


# ---------------------------------------------------------------------------
# pure stdlib+numpy PNG codec (no PIL/OpenCV): PNG = zlib-compressed
# scanlines, each prefixed by one of five byte filters (spec §9). Supports
# bit depth 8, color types 0 (grayscale) and 2 (RGB), non-interlaced — the
# layout every training-data image shard uses.
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array → PNG bytes. ``(h, w)`` → grayscale, ``(h, w, 3)`` → RGB.
    ``filter_type`` selects the scanline filter (0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth) — any choice decodes to the same pixels; non-zero
    types exist mainly so tests can exercise every decoder branch."""
    import zlib

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, bpp = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, bpp = 2, 3
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8 array, got {arr.shape}")
    h, w = a.shape[:2]
    flat = a.reshape(h, w * bpp).astype(np.int16)  # headroom for predictors
    prev = np.zeros(w * bpp, dtype=np.int16)
    rows = []
    for y in range(h):
        row = flat[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int16), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int16), prev[:-bpp]])
        if filter_type == 0:
            raw = row
        elif filter_type == 1:
            raw = row - left
        elif filter_type == 2:
            raw = row - prev
        elif filter_type == 3:
            raw = row - (left + prev) // 2
        elif filter_type == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            raw = row - pred
        else:
            raise ValueError(f"bad filter_type {filter_type}")
        rows.append(bytes([filter_type]) + (raw % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(b: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (``(h, w)`` grayscale or ``(h, w, 3)`` RGB).
    All five scanline filters; bit depth 8, color types 0/2, non-interlaced.
    Raises ValueError on other layouts (16-bit, palette, alpha, Adam7).

    Performance note: filters 0/1/2 decode vectorized (~300-400 Mpx/s);
    3 (Average) and 4 (Paeth) carry a left-pixel dependency through a floor,
    which no prefix trick removes — they fall back to a per-byte Python scan
    over plain lists (~7 / ~3 Mpx/s at 640px scanlines; tools/bench_png.py).
    Fine for the clip/fixture sizes here; for libpng-encoded megapixel
    shards (adaptive per-row filters) decode with PIL where available, or
    re-encode the shard with filter 0 once at ingest."""
    import zlib

    if not b or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,), tag = struct.unpack(">I", b[pos : pos + 4]), b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or color not in (0, 2) or interlace != 0:
                raise ValueError(
                    f"unsupported PNG layout (depth={depth} color={color} interlace={interlace})"
                )
            bpp = 3 if color == 2 else 1
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    data = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * bpp
    if len(data) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    data = data.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype, raw = int(data[y, 0]), data[y, 1:]
        if ftype == 0:
            recon = raw.copy()
        elif ftype == 1:  # Sub telescopes to a per-lane prefix sum mod 256
            recon = raw.copy()
            for o in range(bpp):
                recon[o::bpp] = np.cumsum(raw[o::bpp], dtype=np.uint64) % 256
        elif ftype == 2:
            recon = raw + prev  # uint8 wraparound == mod 256
        elif ftype in (3, 4):  # sequential left-dependency: per-byte scan
            # plain-python lists: numpy scalar indexing costs ~10x more per
            # element than list access, and this loop is the codec's only
            # non-vectorized path (see tools/bench_png.py for the rate)
            raw_l, prev_l = raw.tolist(), prev.tolist()
            recon_l = [0] * stride
            if ftype == 3:
                for x in range(stride):
                    left = recon_l[x - bpp] if x >= bpp else 0
                    recon_l[x] = (raw_l[x] + ((left + prev_l[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    left = recon_l[x - bpp] if x >= bpp else 0
                    up = prev_l[x]
                    upleft = prev_l[x - bpp] if x >= bpp else 0
                    p = left + up - upleft
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else upleft)
                    recon_l[x] = (raw_l[x] + pred) & 0xFF
            recon = np.asarray(recon_l, dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = recon
        prev = recon
    return out.reshape(h, w) if bpp == 1 else out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# pure stdlib AVI codec (no OpenCV): RIFF container with uncompressed 24-bit
# DIB frames ('00db' chunks, BGR bottom-up rows padded to 4 bytes) — the
# layout cv2.VideoWriter(fourcc=0) produces. Enough for event-clip export
# (reference social_behaviour_detection.py:880-921) and round-trip tests.
# ---------------------------------------------------------------------------


def encode_avi(
    frames: np.ndarray,
    fps: float = 50.0,
    codec: str = "raw",
    quality: int = 85,
) -> bytes:
    """uint8 frames → AVI bytes. ``(n, h, w)`` grayscale (channel-expanded)
    or ``(n, h, w, 3)`` RGB — the PNG codec's channel convention, so the two
    codecs compose without swaps.

    ``codec="raw"`` (default): uncompressed 24-bit DIB ('00db' chunks,
    BGR bottom-up per spec — the byte flip happens here; what
    cv2.VideoWriter(fourcc=0) produces). ``codec="mjpeg"`` (r10): each
    frame a baseline 4:2:0 JPEG in a '00dc' chunk under fourcc 'MJPG' —
    the camera-rig format the reference probes with cv2.VideoCapture
    (`detect_fights_all_epochs.py:53-79`), ~10-20x smaller at the cost
    of quantization error; pure numpy (operators/jpeg.py), no OpenCV."""
    a = np.ascontiguousarray(frames, dtype=np.uint8)
    if a.ndim == 3:
        a = np.repeat(a[..., None], 3, axis=3)
    if a.ndim != 4 or a.shape[3] != 3:
        raise ValueError(f"expected (n,h,w) or (n,h,w,3) uint8, got {frames.shape}")
    if codec not in ("raw", "mjpeg"):
        raise ValueError(f"codec must be 'raw' or 'mjpeg', got {codec!r}")
    mjpeg = codec == "mjpeg"
    n, h, w = a.shape[:3]
    row_bytes = w * 3
    pad = (-row_bytes) % 4

    payloads: list[bytes] = []
    if mjpeg:
        from .jpeg import encode_jpeg

        for i in range(n):
            payloads.append(encode_jpeg(a[i], quality=quality, subsample=True))
    else:
        bgr = a[..., ::-1]  # RGB in-memory -> BGR on disk (DIB byte order)
        pad_row = b"\x00" * pad
        for i in range(n):
            # DIB: bottom-up rows, BGR byte order, 4-byte-aligned
            rows = np.ascontiguousarray(bgr[i, ::-1]).reshape(h, row_bytes).tobytes()
            if pad:
                rows = b"".join(
                    rows[r * row_bytes : (r + 1) * row_bytes] + pad_row
                    for r in range(h)
                )
            payloads.append(rows)
    frame_size = max((len(p) for p in payloads), default=(row_bytes + pad) * h)
    tag = b"00dc" if mjpeg else b"00db"
    handler = b"MJPG" if mjpeg else b"DIB "
    compression = int.from_bytes(b"MJPG", "little") if mjpeg else 0

    def lst(tag_: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", len(body) + 4) + tag_ + body

    def chk(tag_: bytes, body: bytes) -> bytes:
        return tag_ + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) % 2))

    rate = max(1, int(round(fps * 1000)))
    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(round(1e6 / fps)), frame_size * int(fps), 0, 0x10,  # µs/frame, bytes/s, pad, HASINDEX
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", handler, 0, 0, 0, 0, 1000, rate, 0, n, frame_size, 0, 0,
        0, 0, int(w), int(h),
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, frame_size, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chk(b"avih", avih) + lst(b"strl", chk(b"strh", strh) + chk(b"strf", strf)))

    movi_items, idx = [], []
    off = 4  # idx1 offsets count from the 'movi' tag
    for p in payloads:
        movi_items.append(chk(tag, p))
        idx.append(struct.pack("<4sIII", tag, 0x10, off, len(p)))
        off += 8 + len(p) + (len(p) % 2)
    movi = lst(b"movi", b"".join(movi_items))
    idx1 = chk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(b: bytes, every_n: int = 1) -> tuple[np.ndarray, float]:
    """AVI bytes → (frames ``(n, h, w, 3)`` uint8 RGB, fps). Supports the
    uncompressed-DIB layout ``encode_avi`` writes (and cv2 fourcc=0) — the
    on-disk BGR bytes are flipped to RGB here, so round-trips with the PNG
    codec need no channel swaps — AND (r10) MJPEG streams: '00dc' chunks
    whose payload is a baseline JPEG (SOI-sniffed) decode through the
    pure-numpy codec in operators/jpeg.py, the camera-rig format the
    reference probes with cv2.VideoCapture. ``every_n`` keeps frames 0,
    n, 2n, … and skips the decode of the rest (chunk headers are still
    walked — that is the cheap part). Raises ValueError on
    corrupt/truncated input; embedded size fields are bounds-checked,
    never trusted."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n!r}")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI")

    w = h = None
    us_per_frame = 40000
    frames: list[np.ndarray] = []
    seen = 0

    def walk(lo: int, hi: int) -> None:
        nonlocal w, h, us_per_frame, seen
        hi = min(hi, len(b))
        pos = lo
        while pos + 8 <= hi:
            tag = b[pos : pos + 4]
            (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
            body_lo = pos + 8
            if body_lo + size > len(b):
                raise ValueError("truncated AVI (chunk size exceeds data)")
            if tag == b"LIST":
                walk(body_lo + 4, body_lo + size)
            elif tag == b"avih":
                if size < 40:
                    raise ValueError("truncated AVI header")
                (us_per_frame,) = struct.unpack("<I", b[body_lo : body_lo + 4])
                w, h = struct.unpack("<II", b[body_lo + 32 : body_lo + 40])
            elif tag == b"00db":
                if w is None:
                    raise ValueError("AVI frame before header")
                if seen % every_n == 0:
                    stride = (w * 3 + 3) // 4 * 4
                    raw = np.frombuffer(b[body_lo : body_lo + size], dtype=np.uint8)
                    if len(raw) != stride * h:
                        raise ValueError("AVI frame has wrong length")
                    img = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[::-1]
                    frames.append(img[:, :, ::-1].copy())  # BGR disk -> RGB
                seen += 1
            elif tag == b"00dc":
                # compressed stream: baseline JPEG payloads (MJPEG).
                # JPEG output is top-down RGB already — no DIB flip.
                if seen % every_n == 0:
                    payload = b[body_lo : body_lo + size]
                    if payload[:2] != b"\xff\xd8":
                        raise ValueError(
                            "compressed AVI frame is not MJPEG (only "
                            "baseline-JPEG '00dc' streams are supported "
                            "without OpenCV; transcode H.264 upstream)"
                        )
                    from .jpeg import decode_jpeg

                    img = decode_jpeg(payload)
                    if img.ndim == 2:
                        img = np.repeat(img[..., None], 3, axis=2)
                    frames.append(img)
                seen += 1
            pos = body_lo + size + (size % 2)

    walk(12, len(b))
    fps = 1e6 / us_per_frame if us_per_frame else 0.0
    return np.stack(frames) if frames else np.zeros((0, 0, 0, 3), np.uint8), fps


def _try_decode_png(b: bytes) -> np.ndarray | None:
    """decode_png, or None for corrupt/unsupported layouts (16-bit, palette,
    alpha, Adam7) — lets the operators fall back to PIL-or-fake instead of
    failing the whole Arrow batch on one odd file."""
    import zlib

    try:
        return decode_png(b)
    except (ValueError, struct.error, zlib.error):
        return None


def _resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (pixel-center rule)."""
    src_h, src_w = img.shape[:2]
    yi = np.minimum(((np.arange(height) + 0.5) * src_h / height).astype(int), src_h - 1)
    xi = np.minimum(((np.arange(width) + 0.5) * src_w / width).astype(int), src_w - 1)
    return img[yi][:, xi]


def _check_on_error(on_error: str, extra: tuple[str, ...] = ()) -> None:
    allowed = ("raise", "quarantine") + extra
    if on_error not in allowed:
        raise ValueError(f"on_error must be one of {allowed}, got {on_error!r}")


def _with_quarantine_fields(schema: T.StructType) -> T.StructType:
    """The operator's schema + the quarantine side-channel columns —
    null on healthy rows, (class, message) on undecodable ones."""
    return T.StructType(
        list(schema.fields)
        + [
            T.StructField("error_class", T.StringType()),
            T.StructField("error_message", T.StringType()),
        ]
    )


def _quarantine_rec(keys: dict, e: Exception, null_cols: list[str] | None = None) -> dict:
    """One quarantined output row: the identifying keys, nulls for every
    feature column, and the error identity (class name + bounded
    message — executor exceptions can embed whole byte dumps)."""
    rec = dict(keys)
    for c in null_cols or ():
        rec[c] = None
    rec["error_class"] = type(e).__name__
    rec["error_message"] = str(e)[:500]
    return rec


def decode_image_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    feature_dim: int = 16,
    allow_fake: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Decode images and emit a small feature vector per image via
    ``mapInPandas`` (Arrow batches; one task per input partition).

    Decode ladder per image: pure ``decode_png`` FIRST for decodable PNG
    inputs (REAL pixels, no library, environment-invariant — the same PNG
    yields the same features with or without PIL installed) → PIL for other
    containers/layouts when installed → otherwise the deterministic
    content-hash fake, clearly marked, and only when ``allow_fake`` — with
    ``allow_fake=False`` an undecodable row raises instead of silently
    producing fake features. Features: mean luma (unweighted channel mean
    for RGB — not ITU-601) + ``feature_dim`` evenly-strided normalized
    intensities.

    ``on_error='quarantine'`` (r14 VERDICT task 3): instead of one bad
    blob killing the whole stage — fatal at 100 TB, where a stray
    mis-transcoded file is a certainty — an undecodable row emits null
    features plus ``(error_class, error_message)`` columns appended to
    the schema; healthy rows carry nulls there. Filter
    ``error_class IS NOT NULL`` for the quarantine side-channel, matching
    the reference's warn-and-continue stream discipline
    (`combine_pose_id_chunk.py:50-55`, SURVEY T2). Default ``'raise'``
    keeps the exact pre-r15 behavior AND schema."""
    _check_on_error(on_error)
    try:  # pragma: no cover - exercised only where PIL exists
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def _features(gray: np.ndarray) -> tuple[float, np.ndarray]:
        flat = gray.flatten()
        idx = np.linspace(0, len(flat) - 1, feature_dim).astype(int)
        return float(gray.mean()), (flat[idx] / 255.0).astype("float32")

    def _decode_one(rid, b) -> tuple[float, np.ndarray]:
        if (
            b is not None
            and bytes(b[:8]) == b"\x89PNG\r\n\x1a\n"
            and (img := _try_decode_png(bytes(b))) is not None
        ):
            img = img.astype(float)
            if img.ndim == 3:
                img = img.mean(axis=2)
            return _features(img)
        if have_pil:
            import io

            from PIL import Image

            img = np.asarray(Image.open(io.BytesIO(b)).convert("L"), dtype=float)
            return _features(img)
        if allow_fake:
            # FAKE DECODE (deterministic): content-hash pseudo pixels
            digest = hashlib.sha256(b or b"").digest()
            arr = np.frombuffer(
                (digest * ((feature_dim * 8) // len(digest) + 1))[: feature_dim * 8],
                dtype="<u4",
            ).astype(float)
            feat = ((arr % 1000) / 1000.0).astype("float32")[:feature_dim]
            return float(feat.mean()), feat
        raise NotImplementedError(
            f"row id={rid}: not a decodable PNG and PIL is "
            "unavailable; pass allow_fake=True to stub such rows"
        )

    quarantine = on_error == "quarantine"
    cols = ["id", "mean_luma", "feature"] + (
        ["error_class", "error_message"] if quarantine else []
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                rid = row["id"]
                if quarantine:
                    try:
                        luma, feat = _decode_one(rid, row[binary_col])
                        rec = {"id": rid, "mean_luma": luma,
                               "feature": feat.tolist(),
                               "error_class": None, "error_message": None}
                    except Exception as e:
                        rec = _quarantine_rec(
                            {"id": rid}, e, ["mean_luma", "feature"]
                        )
                else:
                    luma, feat = _decode_one(rid, row[binary_col])
                    rec = {"id": rid, "mean_luma": luma,
                           "feature": feat.tolist()}
                out.append(rec)
            yield pd.DataFrame(out, columns=cols)

    schema = (
        _with_quarantine_fields(IMAGE_FEATURE_SCHEMA)
        if quarantine
        else IMAGE_FEATURE_SCHEMA
    )
    return df.select(F.col(id_col).alias("id"), F.col(binary_col)).mapInPandas(
        run, schema
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


def decode_audio_features(
    df: DataFrame, id_col: str, binary_col: str, on_error: str = "null"
) -> DataFrame:
    """Audio feature extraction over opaque WAV binary columns via
    ``mapInPandas`` — REAL (PCM16 parse is pure struct/numpy): sample rate,
    channel count, duration, RMS, peak, zero-crossing rate. Non-WAV /
    malformed bytes yield null features, not task failures.

    ``on_error`` (r14 VERDICT task 3): ``'null'`` (default — the
    operator's historical warn-and-continue shape) nulls the features
    silently; ``'quarantine'`` additionally appends ``(error_class,
    error_message)`` columns naming WHY each row failed (null on healthy
    rows); ``'raise'`` fails fast on the first undecodable blob."""
    _check_on_error(on_error, extra=("null",))
    quarantine = on_error == "quarantine"
    feat_cols = ["sample_rate", "n_channels", "duration_s", "rms", "peak",
                 "zero_cross_rate"]
    schema = (
        _with_quarantine_fields(AUDIO_FEATURE_SCHEMA)
        if quarantine
        else AUDIO_FEATURE_SCHEMA
    )
    cols = [f.name for f in schema]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, b in zip(pdf["id"], pdf[binary_col]):
                parsed = _parse_wav_pcm16(b)
                if parsed is None or len(parsed[2]) == 0:
                    e = ValueError(
                        "not a parseable PCM16 RIFF/WAVE blob (or empty "
                        "sample data) — transcode upstream"
                    )
                    if on_error == "raise":
                        raise type(e)(f"row id={rid}: {e}")
                    rec = {"id": rid, **{c: None for c in feat_cols}}
                    if quarantine:
                        rec = _quarantine_rec({"id": rid}, e, feat_cols)
                    out.append(rec)
                    continue
                sr, nch, s = parsed
                zc = float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1]))) if len(s) > 1 else 0.0
                rec = {
                    "id": rid,
                    "sample_rate": sr,
                    "n_channels": nch,
                    "duration_s": len(s) / nch / sr,
                    "rms": float(np.sqrt(np.mean(s**2))),
                    "peak": float(np.abs(s).max()),
                    "zero_cross_rate": zc,
                }
                if quarantine:
                    rec["error_class"] = rec["error_message"] = None
                out.append(rec)
            yield pd.DataFrame(out, columns=cols)

    return df.select(F.col(id_col).alias("id"), F.col(binary_col)).mapInPandas(
        run, schema
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

    Decode ladder per image: ``decode_png`` + nearest-neighbor resample +
    ``encode_png`` FIRST for decodable PNG inputs (REAL pixels, no library,
    environment-invariant) → PIL for other containers/layouts when
    installed → otherwise a deterministic fake emitting a VALID decodable
    PNG of the target size whose pixels derive from the source bytes' hash,
    only when ``allow_fake`` — with ``allow_fake=False`` an undecodable row
    raises instead of silently faking."""
    try:  # pragma: no cover - exercised only where PIL exists
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def fake_png(src: bytes) -> bytes:
        # FAKE RESIZE (deterministic): a real encode of content-hash pixels —
        # NOT decoded source pixels, but fully decodable downstream
        digest = hashlib.sha256(src or b"").digest()
        n_px = height * width
        px = np.frombuffer((digest * (n_px // len(digest) + 1))[:n_px], dtype=np.uint8)
        return encode_png(px.reshape(height, width))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, b in zip(pdf["id"], pdf[binary_col]):
                if (
                    b is not None
                    and bytes(b[:8]) == b"\x89PNG\r\n\x1a\n"
                    and (img := _try_decode_png(bytes(b))) is not None
                ):
                    data = encode_png(_resize_nearest(img, width, height))
                elif have_pil:
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(b)).resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    data = buf.getvalue()
                elif allow_fake:
                    data = fake_png(b)
                else:
                    raise NotImplementedError(
                        f"row id={rid}: not a decodable PNG and PIL is "
                        "unavailable; pass allow_fake=True to stub such rows"
                    )
                out.append({"id": rid, "image": data, "width": width, "height": height})
            yield pd.DataFrame(out, columns=["id", "image", "width", "height"])

    return df.select(F.col(id_col).alias("id"), F.col(binary_col)).mapInPandas(
        run, RESIZED_SCHEMA
    )


def video_frame_source(
    videos: DataFrame,
    id_col: str,
    binary_col: str,
    every_n: int = 1,
    on_error: str = "raise",
) -> DataFrame:
    """Video frame SOURCE (SURVEY S8, reference
    `detect_fights_all_epochs.py:53-79` cv2.VideoCapture probing): explode a
    binary column of AVI blobs into one row per (sampled) frame with REAL
    pixels re-encoded as PNG — no OpenCV; the pure-stdlib ``decode_avi``
    reads the uncompressed-DIB layout cv2 writes at fourcc=0.

    Returns (id, frame_idx, fps, height, width, png) via ``mapInPandas`` —
    Arrow batches, one task per input partition; each video's frames emit
    from the task holding its bytes, so nothing is shuffled. ``every_n``
    subsamples INSIDE the decoder (skipped frames never materialize as
    arrays — the chunk walk still scans their headers, which is cheap).

    ``on_error='quarantine'`` (r14 VERDICT task 3): a blob the decoder
    cannot handle — corrupt RIFF, truncated chunks, an H.264/H.265
    stream that should have been transcoded upstream — emits ONE row
    with null frame columns and ``(error_class, error_message)``
    appended to the schema, instead of its exception killing the whole
    stage (at 100 TB one stray transcoded-wrong file is a certainty).
    Healthy videos carry nulls in the error columns; filter
    ``error_class IS NOT NULL`` for the quarantine side-channel —
    the reference's own warn-and-continue discipline on bad streams
    (`combine_pose_id_chunk.py:50-55`, SURVEY T2). Default ``'raise'``
    keeps the exact pre-r15 behavior AND schema."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n!r}")
    _check_on_error(on_error)
    quarantine = on_error == "quarantine"
    base_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("fps", T.DoubleType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("png", T.BinaryType()),
        ]
    )
    out_schema = _with_quarantine_fields(base_schema) if quarantine else base_schema
    frame_cols = ["frame_idx", "fps", "height", "width", "png"]
    cols = ["id"] + frame_cols + (
        ["error_class", "error_message"] if quarantine else []
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, b in zip(pdf["id"], pdf[binary_col]):
                try:
                    frames, fps = decode_avi(bytes(b), every_n=every_n)
                except Exception as e:
                    if not quarantine:
                        raise
                    out.append(_quarantine_rec({"id": rid}, e, frame_cols))
                    continue
                for j in range(len(frames)):
                    rec = {
                        "id": rid,
                        "frame_idx": j * every_n,
                        "fps": fps,
                        "height": frames.shape[1],
                        "width": frames.shape[2],
                        "png": encode_png(frames[j]),
                    }
                    if quarantine:
                        rec["error_class"] = rec["error_message"] = None
                    out.append(rec)
            yield pd.DataFrame(out, columns=cols)

    return videos.select(F.col(id_col).alias("id"), F.col(binary_col)).mapInPandas(
        run, out_schema
    )


def image_pixel_stats(
    df: DataFrame,
    png_col: str,
    keep_cols: list[str],
) -> DataFrame:
    """Per-image pixel statistics from REAL decoded pixels (SURVEY S8/U5;
    reference `detect_fights_all_epochs.py:53-79` reads frames and computes
    per-frame measures via cv2): decode each PNG with the pure-stdlib codec
    and emit sum / min / max / count over all channels.

    ``mapInPandas`` over Arrow batches — one task per input partition, no
    shuffle; ``keep_cols`` pass through with their input types so the
    operator composes with ``video_frame_source`` output directly. The
    int64 ``pixel_sum`` cannot overflow below ~2^43-pixel images."""
    out_schema = T.StructType(
        [df.schema[c] for c in keep_cols]
        + [
            T.StructField("pixel_sum", T.LongType()),
            T.StructField("pixel_min", T.IntegerType()),
            T.StructField("pixel_max", T.IntegerType()),
            T.StructField("n_px", T.LongType()),
        ]
    )
    cols = list(keep_cols) + ["pixel_sum", "pixel_min", "pixel_max", "n_px"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                arr = decode_png(bytes(row[png_col]))
                rec = {c: row[c] for c in keep_cols}
                rec.update(
                    pixel_sum=int(arr.astype(np.int64).sum()),
                    pixel_min=int(arr.min()),
                    pixel_max=int(arr.max()),
                    n_px=int(arr.size),
                )
                out.append(rec)
            yield pd.DataFrame(out, columns=cols)

    return df.select(*keep_cols, png_col).mapInPandas(run, out_schema)


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
