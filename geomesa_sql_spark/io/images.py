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


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_SIG = PNG_SIG  # back-compat alias for in-module history


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


# Adam7 interlace passes: (x0, y0, dx, dy), spec order
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
# 64 MP: same allocation-bomb cap rationale as io/gif.py _MAX_PIXELS
_PNG_MAX_PIXELS = 1 << 26
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}


def _png_unfilter(sub: bytes, w: int, h: int, channels: int, depth: int) -> np.ndarray:
    """Filtered scanlines → (h, row_bytes) unfiltered bytes (filters 0-4
    with the byte-level bpp the spec defines: sub-byte depths filter at
    bpp=1)."""
    row_bytes = (w * channels * depth + 7) // 8
    bpp = max(1, (channels * depth) // 8)
    need = h * (1 + row_bytes)
    if len(sub) < need:
        raise ValueError("PNG pixel data ended early")
    rows = np.frombuffer(bytes(sub[:need]), np.uint8).reshape(h, 1 + row_bytes)
    filters = rows[:, 0]
    data = rows[:, 1:]
    if (filters > 4).any():
        raise ValueError("bad PNG filter type")
    # vectorized fast paths — filter 0 (all our encoder emits) and the
    # Up filter (a column-wise cumulative sum); the general per-row
    # loop below only runs for Sub/Average/Paeth scanlines
    if not filters.any():
        return data.copy()
    if (filters == 2).all():
        return (np.cumsum(data.astype(np.int64), axis=0) & 0xFF).astype(np.uint8)
    out = np.zeros((h, row_bytes), dtype=np.uint8)
    for row in range(h):
        line = data[row].astype(np.int32)
        f = filters[row]
        prev = (out[row - 1].astype(np.int32) if row
                else np.zeros(row_bytes, dtype=np.int32))
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub(1) / Average(3) / Paeth(4) need sequential scan
            cur = np.zeros(row_bytes, dtype=np.int32)
            for i in range(row_bytes):
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
    return out


def _png_samples(plane: np.ndarray, w: int, h: int, channels: int,
                 depth: int) -> np.ndarray:
    """(h, row_bytes) unfiltered bytes → (h, w, channels) uint8 samples.
    16-bit takes the high (network-order) byte; sub-byte samples are
    returned RAW (palette indexes must not be rescaled — the caller
    scales grayscale)."""
    if depth == 8:
        return plane.reshape(h, w, channels)
    if depth == 16:
        return plane.reshape(h, w, channels, 2)[..., 0].copy()
    bits = np.unpackbits(plane, axis=1)[:, : w * depth].reshape(h, w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits * weights).sum(axis=2, dtype=np.uint16)[..., None].astype(np.uint8)


@clean_decode
def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8.

    Foreign-file surface: all five color types (grayscale, RGB,
    palette, gray+alpha, RGBA), every legal bit depth (1/2/4/8/16 —
    16-bit downconverts via the high byte, sub-byte grayscale rescales
    to 0-255, palette indexes look up PLTE), filters 0-4, and Adam7
    interlace. Alpha is dropped (the engine's payload model is opaque
    RGB). tRNS is ignored for the same reason."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    plte = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack_from(
                ">IIBBBBB", payload
            )
            if (comp != 0 or filt != 0 or interlace not in (0, 1)
                    or ctype not in _PNG_CHANNELS
                    or depth not in _PNG_DEPTHS[ctype]):
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype}, "
                    f"interlace={interlace})"
                )
            if w * h > _PNG_MAX_PIXELS:
                # 32-bit header dims could demand terabytes from a
                # 30-byte payload — same task-safety cap as io/gif.py
                raise ValueError(f"implausible PNG dimensions {w}x{h}")
        elif tag == b"PLTE":
            if len(payload) % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    channels = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        samples = _png_samples(
            _png_unfilter(raw, w, h, channels, depth), w, h, channels, depth)
    else:  # Adam7: seven independently-filtered sub-images
        samples = np.zeros(
            (h, w, channels),
            dtype=np.uint8,
        )
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes zero bytes
            row_bytes = (pw * channels * depth + 7) // 8
            sub = raw[off : off + ph * (1 + row_bytes)]
            off += ph * (1 + row_bytes)
            samples[y0::dy, x0::dx] = _png_samples(
                _png_unfilter(sub, pw, ph, channels, depth),
                pw, ph, channels, depth)

    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        idx = samples[..., 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[idx].copy()
    if ctype == 2:
        return samples.copy()
    if ctype == 6:
        return samples[..., :3].copy()
    # grayscale (0) / gray+alpha (4): rescale sub-byte levels, replicate
    g = samples[..., 0]
    if depth < 8:
        g = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    return np.repeat(g[..., None], 3, axis=2)


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
def _bmp_rle(payload: bytes, w: int, h: int, four_bit: bool) -> np.ndarray:
    """RLE8/RLE4 → (h, w) palette indexes in STORAGE order (row 0 =
    bottom scanline; the caller flips). Escapes: 0=end-of-line,
    1=end-of-bitmap, 2=delta, n≥3=absolute run (word-aligned)."""
    out = np.zeros((h, w), np.uint8)
    x = y = i = 0
    while i + 1 < len(payload):
        n, v = payload[i], payload[i + 1]
        i += 2
        if n:  # encoded run: n pixels of v (RLE4 alternates nibbles)
            if y >= h:
                raise ValueError("BMP RLE run outside the bitmap")
            take = min(n, w - x)
            if take > 0:
                if four_bit:
                    pix = np.empty(take, np.uint8)
                    pix[0::2] = v >> 4
                    pix[1::2] = v & 0x0F
                else:
                    pix = np.full(take, v, np.uint8)
                out[y, x : x + take] = pix
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return out
        elif v == 2:  # delta
            if i + 1 >= len(payload):
                raise ValueError("truncated BMP RLE delta")
            x += payload[i]
            y += payload[i + 1]
            i += 2
        else:  # absolute mode: v literal pixels, padded to a word
            nbytes = (v + 1) // 2 if four_bit else v
            chunk = payload[i : i + nbytes]
            if len(chunk) < nbytes:
                raise ValueError("truncated BMP RLE absolute run")
            i += nbytes + (nbytes & 1)
            if y >= h:
                raise ValueError("BMP RLE run outside the bitmap")
            if four_bit:
                b = np.frombuffer(chunk, np.uint8)
                pix = np.empty(nbytes * 2, np.uint8)
                pix[0::2] = b >> 4
                pix[1::2] = b & 0x0F
                pix = pix[:v]
            else:
                pix = np.frombuffer(chunk, np.uint8)
            take = min(v, w - x)
            if take > 0:
                out[y, x : x + take] = pix[:take]
            x += v
    return out


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8.

    Foreign-file surface: uncompressed 1/4/8-bit palette, 16-bit
    (RGB555 or BI_BITFIELDS masks), 24/32-bit, RLE8/RLE4 runs, bottom-up
    and top-down rows."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    hsize, w, h = struct.unpack_from("<Iii", data, 14)
    if hsize < 40:
        raise ValueError("BMP core headers are not supported")
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if compression not in (0, 1, 2, 3) or bpp not in (1, 4, 8, 16, 24, 32):
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression}: PNG/JPEG-embedded "
            "BMPs (BI_PNG/BI_JPEG) are not implemented"
        )
    topdown = h < 0
    h = abs(h)
    if w * h > _PNG_MAX_PIXELS:  # same task-safety cap as png/gif
        raise ValueError(f"implausible BMP dimensions {w}x{h}")

    def palette():
        ncol = struct.unpack_from("<I", data, 46)[0] or (1 << bpp)
        pal = np.frombuffer(data, np.uint8, 4 * ncol, 14 + hsize).reshape(ncol, 4)
        return pal, ncol

    if compression in (1, 2):  # RLE8 / RLE4
        if (compression == 1) != (bpp == 8) or (compression == 2) != (bpp == 4):
            raise ValueError("BMP RLE compression/bpp mismatch")
        pal, ncol = palette()
        idx = _bmp_rle(data[offset:], w, h, four_bit=compression == 2)
        if not topdown:
            idx = idx[::-1]
        if int(idx.max(initial=0)) >= ncol:
            raise ValueError("BMP palette index out of range")
        return pal[idx][:, :, 2::-1].copy()

    stride = ((w * bpp + 31) // 32) * 4
    if offset + stride * h > len(data):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, np.uint8, stride * h, offset).reshape(h, stride)
    if not topdown:
        rows = rows[::-1]
    if bpp in (1, 4, 8):
        pal, ncol = palette()
        if bpp == 8:
            idx = rows[:, :w]
        else:
            bits = np.unpackbits(rows, axis=1)[:, : w * bpp]
            vals = bits.reshape(h, w, bpp)
            weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint8)
            idx = (vals * weights).sum(axis=2).astype(np.uint8)
        if int(idx.max(initial=0)) >= ncol:
            raise ValueError("BMP palette index out of range")
        return pal[idx][:, :, 2::-1].copy()  # BGRA table → RGB
    if bpp == 16:
        v = rows[:, : w * 2].copy().view("<u2").reshape(h, w).astype(np.uint32)
        if compression == 3:
            rm, gm, bm = struct.unpack_from("<III", data, 54)
            if not (rm and gm and bm):
                raise ValueError("BMP bitfields with a zero channel mask")
        else:
            rm, gm, bm = 0x7C00, 0x03E0, 0x001F  # RGB555 default
        chans = []
        for m in (rm, gm, bm):
            shift = (m & -m).bit_length() - 1
            maxv = m >> shift
            chans.append(((v & m) >> shift) * 255 // maxv)
        return np.stack(chans, axis=2).astype(np.uint8)
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
    if fmt in ("tiff", "tif"):
        # from-scratch TIFF 6.0 decoder (io/tiff.py): strips AND tiles,
        # planar 1/2, none/LZW/deflate/PackBits/JPEG-in-TIFF, predictor,
        # gray/RGB/palette/YCbCr, II/MM (float rasters: decode_tiff_raster)
        from geomesa_sql_spark.io.tiff import decode_tiff

        return decode_tiff(data)
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
