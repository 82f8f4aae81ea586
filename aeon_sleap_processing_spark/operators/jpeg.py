"""Pure-numpy baseline JPEG codec (SURVEY U5/S8 — the compressed-media
gap): DECODE any baseline sequential-DCT JPEG (SOF0 — what MJPEG AVIs
carry, reference probe `detect_fights_all_epochs.py:53-79` via
cv2.VideoCapture), ENCODE a 4:4:4 baseline JPEG for round-trip tests and
MJPEG clip export. No OpenCV/PIL — stdlib + numpy only, like the
PNG/AVI/WAV codecs in operators/multimodal.py.

Decoder coverage: grayscale or YCbCr color, any sampling factors
(4:4:4 / 4:2:2 / 4:2:0 ...), restart intervals (DRI/RSTn), multiple
DQT/DHT per segment, 8-bit quant tables. Progressive (SOF2), arithmetic
coding, 12-bit precision, and 16-bit quant tables raise ValueError
naming the feature — honest bounds, not silent garbage.

Scale shape: this codec runs EXECUTOR-side inside mapInPandas kernels
(video_frame_source / decode_image_features) — pure-python entropy
decode at ~1-3 MB/s per core is the documented rate (committed by
tools/bench_png.py's sibling measurements); the IDCT/color math is
vectorized numpy over all blocks at once. For production H.264 rig
video, transcode upstream or install OpenCV — the engine's own sinks
only ever emit formats this module and multimodal.py read back.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# zigzag position -> raster index within the 8x8 block (ITU T.81 fig 5)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K quantization tables (luminance, chrominance)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman table specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_basis() -> np.ndarray:
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    c = np.cos(np.pi * (2 * n + 1) * k / 16) * np.sqrt(2 / 8)
    c[0] /= np.sqrt(2)
    return c  # F = C @ block @ C.T ; block = C.T @ F @ C


_C = _dct_basis()


def _build_decode_table(bits, vals) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, canonical JPEG code assignment."""
    table, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length)."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitReader:
    """Entropy-segment bit reader: de-stuffs FF00, stops at markers,
    resumes past RSTn on demand."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.d):
                # pad with 1-bits (T.81 allows; trailing EOB territory)
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                continue
            byte = self.d[self.pos]
            if byte == 0xFF:
                nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2  # stuffed FF
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: caller consumes via sync_restart
                else:
                    break  # real marker (EOI/next segment): stop feeding
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.buf = (self.buf << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                raise ValueError("truncated JPEG entropy data")
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self) -> None:
        """Drop partial byte, consume the RSTn marker."""
        self.buf = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.d)
            and self.d[self.pos] == 0xFF
            and 0xD0 <= self.d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected JPEG restart marker")


def _extend(r: int, s: int) -> int:
    return r if r >= (1 << (s - 1)) else r - (1 << s) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 array: (h, w) grayscale or (h, w, 3)
    RGB. Raises ValueError on non-baseline or corrupt input."""
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        seg = b[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline is 8-bit)")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported (baseline is 8-bit)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF{marker - 0xC0} (progressive/extended/arithmetic) "
                "unsupported — baseline sequential (SOF0) only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0xF)
            data_pos = pos + 2 + seglen
            return _decode_scan(
                b, data_pos, frame, sel, qt, huff_dc, huff_ac, restart_interval
            )
        pos += 2 + seglen
        # skip fill bytes between segments
        while pos + 1 < len(b) and b[pos] != 0xFF:
            pos += 1
    raise ValueError("JPEG has no scan (SOS) segment")


def _decode_scan(b, data_pos, frame, sel, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per component: coefficient store (blocks_y, blocks_x, 8, 8)
    stores = []
    for c in comps:
        stores.append(
            np.zeros((mcuy * c["v"], mcux * c["h"], 8, 8), dtype=np.int64)
        )
    reader = _BitReader(b, data_pos)
    preds = [0] * len(comps)
    zz = ZIGZAG
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                tdc, tac = sel[c["id"]]
                dct, act = huff_dc[tdc], huff_ac[tac]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        s = reader.decode_symbol(dct)
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        preds[ci] += diff
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            coef[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.int64)
                        blk[zz] = coef
                        stores[ci][
                            my * c["v"] + by, mx * c["h"] + bx
                        ] = blk.reshape(8, 8)
            mcu_count += 1
    # dequantize + IDCT, all blocks of a component at once (vectorized)
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]].astype(np.float64)
        f = stores[ci].astype(np.float64) * q  # (by, bx, 8, 8)
        spatial = np.einsum("ki,yxkl,lj->yxij", _C, f, _C, optimize=True)
        by, bx = spatial.shape[:2]
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        # upsample to full-resolution grid, crop to (h, w)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"{len(planes)}-component JPEG unsupported")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.buf >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.buf &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JPEG bytes
    (standard Annex-K Huffman tables, libjpeg quality scaling). 4:4:4 by
    default; ``subsample=True`` writes 4:2:0 (2x2 luma sampling, chroma
    box-averaged) — the layout real MJPEG cameras emit, so the decoder's
    interleaved-MCU/upsample path is exercised by round-trip tests, not
    just the trivial one-block-per-MCU case. Lossy by nature;
    round-trips with :func:`decode_jpeg` to within quantization (+
    chroma-subsampling) error (test-pinned)."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_jpeg wants uint8 (h,w) or (h,w,3)")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        facs = [(1, 1)]
    else:
        rgbf = img.astype(np.float64)
        r, g, bch = rgbf[..., 0], rgbf[..., 1], rgbf[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * bch,
            -0.168736 * r - 0.331264 * g + 0.5 * bch + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * bch + 128.0,
        ]
        facs = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(f[0] for f in facs)
    vmax = max(f[1] for f in facs)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    ql = _scaled_quant(QUANT_LUMA.reshape(8, 8), quality)
    qc = _scaled_quant(QUANT_CHROMA.reshape(8, 8), quality)
    quants = [ql] + ([qc, qc] if not gray else [])
    enc_dc = [
        _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    enc_ac = [
        _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]
    coefs = []
    for ci, plane in enumerate(planes):
        hf, vf = facs[ci]
        if (hf, vf) != (hmax, vmax):
            # chroma downsample by box average over the sampling ratio
            ry, rx = vmax // vf, hmax // hf
            pe = np.pad(
                plane,
                ((0, -plane.shape[0] % ry), (0, -plane.shape[1] % rx)),
                mode="edge",
            )
            plane = pe.reshape(
                pe.shape[0] // ry, ry, pe.shape[1] // rx, rx
            ).mean(axis=(1, 3))
        th, tw = mcuy * 8 * vf, mcux * 8 * hf
        p = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        ) - 128.0
        blocks = p.reshape(th // 8, 8, tw // 8, 8).transpose(0, 2, 1, 3)
        f = np.einsum("ik,yxkl,jl->yxij", _C, blocks, _C, optimize=True)
        coefs.append(np.round(f / quants[ci].astype(np.float64)).astype(np.int64))

    def category(v: int) -> int:
        return int(abs(v)).bit_length()

    wtr = _BitWriter()
    preds = [0] * len(planes)
    zz = ZIGZAG
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(len(planes)):
                hf, vf = facs[ci]
                tsel = 0 if ci == 0 else 1
                for byi in range(vf):
                    for bxi in range(hf):
                        blk = coefs[ci][my * vf + byi, mx * hf + bxi]
                        blk = blk.reshape(64)[zz]
                        diff = int(blk[0]) - preds[ci]
                        preds[ci] = int(blk[0])
                        s = category(diff)
                        code, ln = enc_dc[tsel][s]
                        wtr.write(code, ln)
                        if s:
                            wtr.write(
                                diff if diff >= 0 else diff + (1 << s) - 1, s
                            )
                        run = 0
                        nz = np.nonzero(blk[1:])[0]
                        last_nz = (nz[-1] + 1) if len(nz) else 0
                        for k in range(1, last_nz + 1):
                            v = int(blk[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = enc_ac[tsel][0xF0]  # ZRL
                                wtr.write(code, ln)
                                run -= 16
                            s = category(v)
                            code, ln = enc_ac[tsel][(run << 4) | s]
                            wtr.write(code, ln)
                            wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                            run = 0
                        if last_nz < 63:
                            code, ln = enc_ac[tsel][0x00]  # EOB
                            wtr.write(code, ln)
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(ql.reshape(64)[zz].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qc.reshape(64)[zz].astype(np.uint8)))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hf, vf = facs[ci]
        sof += bytes([ci + 1, (hf << 4) | vf, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
