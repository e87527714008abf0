"""Image payload codecs — stdlib-only (no PIL/cv2 in the environment).

The graft input table carries images as opaque ``bytes`` with typed
metadata (image_id, w, h, fmt — BASELINE.json input_hint). Two formats:

- ``raw``: numpy (h, w, 3) uint8 ``tobytes()`` — zero-cost decode.
- ``png``: real PNG (zlib + struct), 8-bit RGB, filter 0 — losslessly
  decodable by any PNG reader; lets the PSNR≥40dB payload invariant be
  exercised through an actual encode→decode round trip.
- ``jpeg``: from-scratch baseline JFIF codec (`io/jpeg.py`: numpy DCT,
  canonical Huffman, 4:4:4/4:2:0, restart markers) — the LOSSY leg of
  the invariant, measured ≥40 dB at quality 90 in tests.

Per-row invariant vs the reference (BASELINE.json:15): decoded-pixel
allclose (PSNR ≥ 40 dB for lossy — exercised by the jpeg codec; raw
and png are lossless so their check is exact) + caption equality.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from geomesa_sql_spark.io.errors import clean_decode


def encode_raw(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → raw bytes."""
    return np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (8-bit RGB, no filtering)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # one filter byte (0 = None) per scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


@clean_decode
def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Supports 8-bit RGB, filters 0-4."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack_from(
                ">IIBBBBB", payload
            )
            if depth != 8 or ctype != 2 or comp != 0 or filt != 0 or interlace != 0:
                # Adam7-interlaced streams reshape to garbage (review
                # r3) — refuse them as cleanly as other unsupported forms
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype}, "
                    f"interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * 3
    raw = raw.reshape(h, stride)
    filters = raw[:, 0]
    # vectorized fast paths — filter 0 (all our encoder emits) and the
    # Up filter (a column-wise cumulative sum); the general per-row
    # loop below only runs for Sub/Average/Paeth scanlines
    if not filters.any():
        return raw[:, 1:].reshape(h, w, 3).copy()
    if (filters == 2).all():
        return (
            np.cumsum(raw[:, 1:].astype(np.int64), axis=0) & 0xFF
        ).astype(np.uint8).reshape(h, w, 3)
    out = np.zeros((h, w * 3), dtype=np.uint8)
    bpp = 3
    for row in range(h):
        line = raw[row, 1:].astype(np.int32)
        f = filters[row]
        prev = out[row - 1].astype(np.int32) if row else np.zeros(w * 3, dtype=np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub(1) / Average(3) / Paeth(4) need sequential scan
            cur = np.zeros(w * 3, dtype=np.int32)
            for i in range(w * 3):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) & 0xFF
        out[row] = cur.astype(np.uint8)
    return out.reshape(h, w, 3)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → BMP bytes (BITMAPINFOHEADER, 24-bit BI_RGB,
    bottom-up rows, BGR order, 4-byte row padding)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + info + body


@clean_decode
def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8. Supports uncompressed (BI_RGB)
    8-bit palette, 24-bit and 32-bit, bottom-up and top-down rows."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    hsize, w, h = struct.unpack_from("<Iii", data, 14)
    if hsize < 40:
        raise ValueError("BMP core headers are not supported")
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if compression not in (0, 3) or bpp not in (8, 24, 32):
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression}: only uncompressed "
            "8/24/32-bit is implemented (RLE needs a run decoder)"
        )
    topdown = h < 0
    h = abs(h)
    stride = (w * (bpp // 8) + 3) & ~3
    if offset + stride * h > len(data):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, np.uint8, stride * h, offset).reshape(h, stride)
    if not topdown:
        rows = rows[::-1]
    if bpp == 8:
        ncol = struct.unpack_from("<I", data, 46)[0] or 256
        pal = np.frombuffer(data, np.uint8, 4 * ncol, 14 + hsize).reshape(ncol, 4)
        idx = rows[:, :w]
        if int(idx.max()) >= ncol:
            raise ValueError("BMP palette index out of range")
        return pal[idx][:, :, 2::-1].copy()  # BGRA table → RGB
    px = rows[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    return px[:, :, 2::-1].copy()  # BGR(A) → RGB


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg"):
        # from-scratch baseline JFIF decoder (io/jpeg.py) — the lossy
        # leg of the PSNR>=40dB payload invariant; lazy import keeps the
        # lossless fast path import-light
        from geomesa_sql_spark.io.jpeg import decode_jpeg

        return decode_jpeg(data)
    if fmt == "webp":
        # from-scratch VP8L lossless decoder (io/webp.py); lossy VP8
        # streams raise loudly inside decode_webp
        from geomesa_sql_spark.io.webp import decode_webp

        return decode_webp(data)
    if fmt == "gif":
        # from-scratch LZW decoder (io/gif.py); first frame of
        # animations, palettes/interlace/transparency handled
        from geomesa_sql_spark.io.gif import decode_gif

        return decode_gif(data)
    if fmt == "bmp":
        return decode_bmp(data)
    raise NotImplementedError(
        f"fmt {fmt!r}: no decoder (PIL/cv2 absent in this container); "
        "plumbing (schema, partitioning, batch shape) is format-agnostic"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float((diff * diff).mean())
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
