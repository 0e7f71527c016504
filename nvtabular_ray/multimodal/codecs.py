"""Pure stdlib+numpy codecs for the multimodal stages' REAL decode path.

No external image/audio libraries exist in this environment, but several
real formats are decodable with nothing beyond the standard library:

- PNG   (stdlib ``zlib`` inflate + numpy defiltering; 8-bit gray/RGB/RGBA,
         non-interlaced — the overwhelmingly common case)
- BMP   (uncompressed BI_RGB, 24/32-bit)
- PPM/PGM (binary P6/P5)
- WAV   (stdlib ``wave``; PCM 8/16/32-bit)

Matching minimal ENCODERS are provided so tests can round-trip
(encode → decode → exact array equality) without any fixture files.

Scale note: decode is inherently per-payload, so the row loop lives here —
but each payload's pixel work is numpy-vectorized, and the stage wrapping
these (``stages.DecodeImageStage``) runs them in an actor pool with small
batches, which is exactly how a codec-bound stage should be shaped.

Reference parity: NVTabular itself has no multimodal decode — this is the
new-scope mandate (SURVEY.md §2.4); the stage wiring mirrors how the
reference shapes stateful ops (/root/reference/nvtabular/ops/column_similarity.py
actor-state pattern).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color type -> channels (8-bit depth only; palette unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a (H, W, C) uint8 array.

    Supports color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA).
    Raises ValueError on anything else (16-bit, palette, interlaced).
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = []
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    img = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    # Defilter scanline by scanline (row-to-row data dependency is inherent
    # to PNG filtering); within a row everything is numpy. Filters 0/2 are
    # fully vectorized; 1/3/4 carry a left-neighbor dependency, resolved
    # with a cumulative pass over width in bpp-strided lanes.
    for y in range(height):
        f = filters[y]
        line = raw[y, 1:].astype(np.int32)
        prev = img[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            out = line
        elif f == 2:  # Up
            out = line + prev
        elif f == 1:  # Sub — per-lane cumulative sum (mod-256 addition is
            # associative, so cumsum & 0xFF is exact and fully vectorized)
            out = line.reshape(-1, bpp).cumsum(axis=0).reshape(stride)
        elif f == 3:  # Average — nonlinear (>>1), so reduce mod 256 as we go
            out = line.copy()
            out[:bpp] = (out[:bpp] + (prev[:bpp] >> 1)) & 0xFF
            for x in range(bpp, stride):
                out[x] = (out[x] + ((out[x - bpp] + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth — nonlinear (abs/min), reduce mod 256 as we go
            out = line.copy()
            out[:bpp] = (out[:bpp] + prev[:bpp]) & 0xFF  # first pixel: Up
            for x in range(bpp, stride):
                a, b, c = out[x - bpp], prev[x], prev[x - bpp]
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb and pa_ <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                out[x] = (out[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        img[y] = out & 0xFF
    return img.reshape(height, width, channels)


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0 every line) for round-trip tests.
    Accepts (H, W) or (H, W, C) uint8 with C in {1, 2, 3, 4}."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * c)], axis=1
    ).tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (uncompressed BI_RGB 24/32-bit) and PPM/PGM
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BI_RGB BMP to (H, W, 3|4) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError("BMP core header unsupported")
    w, h = struct.unpack("<ii", data[18:26])
    bpp, comp = struct.unpack("<HI", data[28:34])
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    c = bpp // 8
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    row_bytes = (w * c + 3) & ~3  # rows padded to 4 bytes
    px = np.frombuffer(data, np.uint8, count=h * row_bytes, offset=off)
    px = px.reshape(h, row_bytes)[:, : w * c].reshape(h, w, c)
    if flip:
        px = px[::-1]
    # BGR(A) -> RGB(A)
    if c == 3:
        px = px[:, :, ::-1]
    else:
        px = px[:, :, [2, 1, 0, 3]]
    return np.ascontiguousarray(px)


def encode_bmp(arr: np.ndarray) -> bytes:
    """24-bit bottom-up BI_RGB encoder for round-trip tests ((H,W,3) uint8)."""
    h, w, c = arr.shape
    assert c == 3
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6) / PGM (P5), maxval 255, to (H, W, C) uint8."""
    if data[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    c = 3 if data[:2] == b"P6" else 1
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comments starting with '#' skipped), then ONE whitespace byte.
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    px = np.frombuffer(data, np.uint8, count=h * w * c, offset=i)
    return px.reshape(h, w, c).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


# ---------------------------------------------------------------------------
# WAV (stdlib wave; PCM)
# ---------------------------------------------------------------------------

_WAV_DTYPE = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV to ((frames, channels) int array, sample_rate).
    Raises ValueError on malformed/empty payloads (the documented contract:
    stdlib ``wave`` raises EOFError/wave.Error, which would escape a
    caller's ValueError handling and kill the stage on one bad row)."""
    try:
        with wave.open(io.BytesIO(data), "rb") as f:
            nch, sw, rate, nframes = (
                f.getnchannels(), f.getsampwidth(), f.getframerate(), f.getnframes()
            )
            raw = f.readframes(nframes)
    except (EOFError, wave.Error) as e:
        raise ValueError(f"not a decodable PCM WAV payload: {e}") from None
    if sw not in _WAV_DTYPE:
        raise ValueError(f"unsupported WAV sample width {sw}")
    a = np.frombuffer(raw, _WAV_DTYPE[sw]).reshape(-1, nch)
    return a, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """PCM16 WAV encoder for tests ((frames,) or (frames, ch) int16)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Dispatch + features
# ---------------------------------------------------------------------------


def sniff_decode_image(data: bytes) -> np.ndarray:
    """Decode by magic bytes (PNG / BMP / PPM / PGM) to (H, W, C) uint8."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] in (b"P6", b"P5"):
        return decode_ppm(data)
    raise ValueError("unrecognized image format (supported: PNG, BMP, PPM/PGM)")


def image_features(img: np.ndarray, out_dim: int) -> np.ndarray:
    """Deterministic feature vector from a decoded image: grayscale,
    nearest-neighbor resample to a ~sqrt(out_dim) grid, flatten, normalize
    to [0, 1] float32, pad/truncate to out_dim."""
    if img.ndim == 3:
        gray = img[:, :, : min(3, img.shape[2])].mean(axis=2)
    else:
        gray = img.astype(np.float64)
    h, w = gray.shape
    d = max(1, int(np.sqrt(out_dim)))
    ys = np.minimum((np.arange(d) * h) // d, h - 1)
    xs = np.minimum((np.arange(d) * w) // d, w - 1)
    v = (gray[np.ix_(ys, xs)].reshape(-1) / 255.0).astype(np.float32)
    out = np.zeros(out_dim, np.float32)
    out[: min(out_dim, v.size)] = v[:out_dim]
    return out


def audio_features(data: bytes, out_dim: int) -> np.ndarray:
    """Windowed RMS-energy envelope of a PCM WAV, out_dim frames, float32
    normalized by int16 full-scale."""
    samples, _rate = decode_wav(data)
    mono = samples.astype(np.float64).mean(axis=1)
    n = mono.size
    if n == 0:
        return np.zeros(out_dim, np.float32)
    edges = (np.arange(out_dim + 1) * n) // out_dim
    sq = np.concatenate([[0.0], np.cumsum(mono * mono)])
    cnt = np.maximum(np.diff(edges), 1)
    rms = np.sqrt(np.diff(sq[edges]) / cnt) / 32768.0
    return rms.astype(np.float32)
