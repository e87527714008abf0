"""Foreign-file PNG surface: color types, bit depths, Adam7 interlace.

The repo's encoder only emits 8-bit RGB filter-0 streams, so this file
carries its own spec-shaped writer (arbitrary color type / depth /
interlace, per-row filter choice) and decodes against the expected RGB
rendering: palette lookup, sub-byte grayscale rescale, 16-bit high-byte
downconversion, alpha dropped.
"""

import struct
import zlib

import numpy as np
import pytest

from geomesa_sql_spark.io.images import _ADAM7, decode_png

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag, payload):
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload)))


def _pack_rows(samples, depth, filters=None):
    """(h, w, channels) int array -> filtered scanline bytes."""
    h, w, channels = samples.shape
    out = bytearray()
    raw_rows = []
    for y in range(h):
        if depth == 8:
            row = samples[y].astype(np.uint8).reshape(-1)
        elif depth == 16:
            v = samples[y].astype(np.uint16).reshape(-1)
            row = np.empty(len(v) * 2, np.uint8)
            row[0::2] = v >> 8
            row[1::2] = v & 0xFF
        else:
            vals = samples[y].reshape(-1).astype(np.uint8)
            bits = ((vals[:, None] >> np.arange(depth - 1, -1, -1)) & 1)
            row = np.packbits(bits.reshape(-1).astype(np.uint8))
        raw_rows.append(row)
    bpp = max(1, (channels * depth) // 8)
    prev = np.zeros(len(raw_rows[0]), np.int32)
    for y, row in enumerate(raw_rows):
        f = 0 if filters is None else filters[y % len(filters)]
        line = row.astype(np.int32)
        if f == 0:
            enc = line
        elif f == 1:
            a = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]]) \
                if len(line) > bpp else np.zeros_like(line)
            enc = (line - a) & 0xFF
        elif f == 2:
            enc = (line - prev) & 0xFF
        elif f == 3:
            a = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]]) \
                if len(line) > bpp else np.zeros_like(line)
            enc = (line - (a + prev) // 2) & 0xFF
        else:  # Paeth
            a = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]]) \
                if len(line) > bpp else np.zeros_like(line)
            c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]]) \
                if len(prev) > bpp else np.zeros_like(prev)
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a,
                            np.where(pb <= pc, prev, c))
            enc = (line - pred) & 0xFF
        out.append(f)
        out += enc.astype(np.uint8).tobytes()
        prev = line
    return bytes(out)


def _write_png(samples, ctype, depth, plte=None, interlace=0, filters=None):
    h, w, channels = samples.shape
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    body = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    if interlace == 0:
        raw = _pack_rows(samples, depth, filters)
    else:
        raw = b""
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += _pack_rows(sub, depth, filters)
    body += _chunk(b"IDAT", zlib.compress(raw))
    return body + _chunk(b"IEND", b"")


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("depth", [1, 2, 4, 8, 16])
def test_grayscale_depths(depth):
    rng = _rng(depth)
    h, w = 9, 13
    g = rng.integers(0, 1 << depth, (h, w, 1))
    blob = _write_png(g, ctype=0, depth=depth)
    got = decode_png(blob)
    if depth == 16:
        want = (g[..., 0] >> 8).astype(np.uint8)
    elif depth < 8:
        want = (g[..., 0] * 255 // ((1 << depth) - 1)).astype(np.uint8)
    else:
        want = g[..., 0].astype(np.uint8)
    assert (got == np.repeat(want[..., None], 3, 2)).all()


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_palette_depths(depth):
    rng = _rng(depth + 10)
    ncol = 1 << depth
    plte = rng.integers(0, 256, (ncol, 3))
    h, w = 7, 11
    idx = rng.integers(0, ncol, (h, w, 1))
    blob = _write_png(idx, ctype=3, depth=depth, plte=plte)
    assert (decode_png(blob) == plte[idx[..., 0]]).all()


@pytest.mark.parametrize("ctype,channels", [(2, 3), (4, 2), (6, 4)])
@pytest.mark.parametrize("depth", [8, 16])
def test_truecolor_and_alpha(ctype, channels, depth):
    rng = _rng(ctype * depth)
    h, w = 6, 10
    s = rng.integers(0, 1 << depth, (h, w, channels))
    blob = _write_png(s, ctype=ctype, depth=depth)
    got = decode_png(blob)
    vals = (s >> 8 if depth == 16 else s).astype(np.uint8)
    if ctype == 2:
        want = vals
    elif ctype == 6:
        want = vals[..., :3]
    else:  # gray + alpha: gray replicated, alpha dropped
        want = np.repeat(vals[..., :1], 3, 2)
    assert (got == want).all()


def test_all_filters_rgba():
    """Sub/Up/Average/Paeth at bpp=4 (RGBA), the non-3 byte offset the
    old RGB-only decoder never exercised."""
    rng = _rng(99)
    s = rng.integers(0, 256, (12, 9, 4))
    blob = _write_png(s, ctype=6, depth=8, filters=[0, 1, 2, 3, 4])
    assert (decode_png(blob) == s[..., :3].astype(np.uint8)).all()


@pytest.mark.parametrize("shape", [(1, 1), (3, 3), (7, 13), (16, 16), (9, 2)])
def test_adam7_interlace_rgb(shape):
    rng = _rng(shape[0] * 31 + shape[1])
    h, w = shape
    s = rng.integers(0, 256, (h, w, 3))
    blob = _write_png(s, ctype=2, depth=8, interlace=1)
    assert (decode_png(blob) == s.astype(np.uint8)).all()


def test_adam7_interlace_subbyte_palette_and_gray():
    rng = _rng(5)
    plte = rng.integers(0, 256, (16, 3))
    idx = rng.integers(0, 16, (11, 5, 1))
    blob = _write_png(idx, ctype=3, depth=4, plte=plte, interlace=1)
    assert (decode_png(blob) == plte[idx[..., 0]]).all()
    g = rng.integers(0, 2, (10, 17, 1))
    blob = _write_png(g, ctype=0, depth=1, interlace=1)
    want = (g[..., 0] * 255).astype(np.uint8)
    assert (decode_png(blob) == np.repeat(want[..., None], 3, 2)).all()


def test_png_rejections():
    rng = _rng(1)
    idx = rng.integers(0, 4, (4, 4, 1))
    plte = rng.integers(0, 256, (4, 3))
    # palette index beyond PLTE
    idx[0, 0, 0] = 3
    short_plte = plte[:3]
    blob = _write_png(idx, ctype=3, depth=8, plte=short_plte)
    with pytest.raises(ValueError, match="palette index"):
        decode_png(blob)
    # palette PNG with no PLTE at all
    blob = _write_png(idx, ctype=3, depth=8, plte=None)
    with pytest.raises(ValueError, match="without PLTE"):
        decode_png(blob)
    # implausible dimensions from a tiny payload
    g = np.zeros((1, 1, 1), np.int64)
    blob = bytearray(_write_png(g, ctype=0, depth=8))
    at = blob.index(b"IHDR") + 4
    blob[at:at + 8] = struct.pack(">II", 0xFFFFF, 0xFFFFF)
    with pytest.raises(ValueError, match="implausible"):
        decode_png(bytes(blob))
    # still-unsupported: depth 16 palette is illegal per spec
    blob = bytearray(_write_png(np.zeros((2, 2, 1), np.int64), ctype=3,
                                depth=8, plte=plte))
    at = blob.index(b"IHDR") + 4 + 8
    blob[at] = 16
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(bytes(blob))
