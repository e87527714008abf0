"""From-scratch baseline TIFF codec — stdlib + numpy only.

Widens ``decode_image``'s foreign-file surface (no PIL in this
container) with the last mainstream still-image container: baseline
TIFF 6.0 (public spec), strip-organized, both byte orders. The
reference engine (bxkftechteam/geomesa-sql) has no media code — this is
payload-side graft like ``io/jpeg.py`` / ``io/webp.py``.

Decoder surface: II (little-endian) and MM (big-endian) headers,
strip layout (RowsPerStrip / StripOffsets / StripByteCounts),
Compression 1 (none), 5 (TIFF-LZW: MSB-first, early-change), 8/32946
(deflate) and 32773 (PackBits), horizontal-differencing Predictor 2,
PhotometricInterpretation 0/1 (grayscale, either polarity), 2 (RGB,
extra samples dropped) and 3 (palette via the 16-bit ColorMap),
BitsPerSample 1/4/8/16 for single-channel images and 8/16 for RGB.
Tiled organization, planar configuration 2, JPEG-in-TIFF, CCITT fax
codings, and floating-point samples raise loudly.

Encoder: strip-based II output with compression none/packbits/lzw and
optional predictor, so round trips exercise every decode path against
streams this module can actually build.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from geomesa_sql_spark.io.errors import clean_decode

# 64 MP task-safety cap, same rationale as io/gif.py / decode_png
_MAX_PIXELS = 1 << 26

# tag ids (TIFF 6.0 §8)
_T_WIDTH, _T_HEIGHT = 256, 257
_T_BITS, _T_COMPRESSION, _T_PHOTometric = 258, 259, 262
_T_STRIP_OFFSETS, _T_SPP, _T_ROWS_PER_STRIP, _T_STRIP_COUNTS = 273, 277, 278, 279
_T_PREDICTOR, _T_COLORMAP, _T_PLANAR = 317, 320, 284
_T_TILE_WIDTH = 322
_T_SAMPLE_FORMAT = 339

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8}


def _read_ifd(data: bytes, bo: str):
    """First IFD → {tag: [values...]} (offsets resolved)."""
    (off,) = struct.unpack_from(bo + "I", data, 4)
    (n,) = struct.unpack_from(bo + "H", data, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        at = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", data, at)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * count
        vat = at + 8
        if total > 4:
            (vat,) = struct.unpack_from(bo + "I", data, at + 8)
        if vat + total > len(data):
            raise ValueError("TIFF tag value runs off the end of the file")
        fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}.get(typ)
        if fmt:
            tags[tag] = list(struct.unpack_from(bo + str(count) + fmt, data, vat))
        elif typ == 5 or typ == 10:  # rationals: keep numerators
            vals = struct.unpack_from(bo + str(2 * count) + "Ii"[typ == 10], data, vat)
            tags[tag] = [vals[2 * k] for k in range(count)]
    return tags


def _packbits_decode(src: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expect:
        n = src[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(src):
                raise ValueError("truncated PackBits stream")
            out += bytes([src[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expect:
        raise ValueError("PackBits stream ended early")
    return bytes(out[:expect])


def _packbits_encode(src: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        j = i
        while j + 1 < n and src[j + 1] == src[j] and j - i < 127:
            j += 1
        if j > i:  # run of (j - i + 1) identical bytes
            out.append(257 - (j - i + 1))
            out.append(src[i])
            i = j + 1
            continue
        # literal segment until a run of >= 3 starts
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and src[j] == src[j + 1] == src[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += src[i:j]
        i = j
    return bytes(out)


def _tiff_lzw_decode(src: bytes, expect: int) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, codes start at 9 bits,
    256=ClearCode, 257=EOI, EARLY width change (at 2^width - 1)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = nbits = 0
    i = 0
    prev: bytes | None = None
    while len(out) < expect:
        while nbits < width:
            if i >= len(src):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | src[i]
            i += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if code == CLEAR:
            reset()
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table) or code > 255:
                raise ValueError("TIFF LZW stream starts with a non-root code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code out of range")
        out += entry
        prev = entry
        # EARLY change, with the decoder's one-entry lag: the writer has
        # already added the entry THIS code implies, so the reader bumps
        # when its table size PLUS the pending entry hits 2^width - 1
        if len(table) + 1 >= (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError("TIFF LZW stream ended early")
    return bytes(out[:expect])


def _tiff_lzw_encode(src: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out_codes: list[tuple[int, int]] = []
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_codes.append((CLEAR, width))
    seq = b""
    for b in src:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        out_codes.append((table[seq], width))
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        elif next_code == 4094:  # table full: clear and restart
            out_codes.append((CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        seq = bytes([b])
    if seq:
        out_codes.append((table[seq], width))
    out_codes.append((EOI, width))
    acc = nbits = 0
    out = bytearray()
    for code, wd in out_codes:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


@clean_decode
def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes → (h, w, 3) uint8 RGB."""
    if len(data) < 8 or data[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF (no II*/MM* header)")
    bo = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, bo)
    if _T_TILE_WIDTH in tags:
        raise NotImplementedError("tiled TIFF organization (strips only)")
    if tags.get(_T_PLANAR, [1])[0] != 1:
        raise NotImplementedError("TIFF planar configuration 2")
    if any(f not in (1, 4) for f in tags.get(_T_SAMPLE_FORMAT, [1])):
        raise NotImplementedError("non-integer TIFF sample format")
    try:
        w = tags[_T_WIDTH][0]
        h = tags[_T_HEIGHT][0]
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags[_T_STRIP_COUNTS]
    except KeyError as ex:
        raise ValueError(f"TIFF missing required tag {ex}") from ex
    if w * h > _MAX_PIXELS:
        raise ValueError(f"implausible TIFF dimensions {w}x{h}")
    spp = tags.get(_T_SPP, [1])[0]
    bits = tags.get(_T_BITS, [1] * spp)
    comp = tags.get(_T_COMPRESSION, [1])[0]
    photo = tags.get(_T_PHOTometric, [1])[0]
    pred = tags.get(_T_PREDICTOR, [1])[0]
    rps = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h
    if len(set(bits)) != 1:
        raise NotImplementedError("per-channel BitsPerSample mixes")
    depth = bits[0]
    if photo in (0, 1, 3):
        if spp != 1 or depth not in (1, 4, 8, 16):
            raise NotImplementedError(
                f"TIFF gray/palette with spp={spp} depth={depth}")
    elif photo == 2:
        if spp < 3 or depth not in (8, 16):
            raise NotImplementedError(f"TIFF RGB with spp={spp} depth={depth}")
    else:
        raise NotImplementedError(
            f"TIFF photometric {photo}: gray/RGB/palette only "
            "(no CMYK/YCbCr/CCITT)")
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")

    row_bytes = (w * spp * depth + 7) // 8
    raw = bytearray()
    rows_done = 0
    for si, (at, cnt) in enumerate(zip(offsets, counts)):
        if at + cnt > len(data):
            raise ValueError("TIFF strip runs off the end of the file")
        nrows = min(rps, h - rows_done)
        expect = nrows * row_bytes
        chunk = data[at : at + cnt]
        if comp == 1:
            if len(chunk) < expect:
                raise ValueError("TIFF strip ended early")
            raw += chunk[:expect]
        elif comp == 32773:
            raw += _packbits_decode(chunk, expect)
        elif comp == 5:
            raw += _tiff_lzw_decode(chunk, expect)
        elif comp in (8, 32946):
            d = zlib.decompress(chunk)
            if len(d) < expect:
                raise ValueError("TIFF deflate strip ended early")
            raw += d[:expect]
        else:
            raise NotImplementedError(
                f"TIFF compression {comp}: none/LZW/deflate/PackBits only "
                "(no CCITT fax or JPEG-in-TIFF)")
        rows_done += nrows
    if rows_done < h:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")

    plane = np.frombuffer(bytes(raw), np.uint8).reshape(h, row_bytes)
    if depth == 8:
        samples = plane.reshape(h, w, spp).astype(np.uint16)
    elif depth == 16:
        v = plane.reshape(h, w, spp, 2).astype(np.uint16)
        samples = ((v[..., 0] << 8) | v[..., 1]) if bo == ">" else (
            (v[..., 1] << 8) | v[..., 0])
    else:
        bits_arr = np.unpackbits(plane, axis=1)[:, : w * depth]
        vals = bits_arr.reshape(h, w, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        samples = (vals * weights).sum(axis=2, dtype=np.uint16)[..., None]
    if pred == 2:
        # horizontal differencing operates on SAMPLE values per row
        samples = np.cumsum(samples.astype(np.int64), axis=1)
        samples &= (1 << depth) - 1
        samples = samples.astype(np.uint16)
    elif pred != 1:
        raise NotImplementedError(f"TIFF predictor {pred}")

    if photo == 3:
        cmap = tags.get(_T_COLORMAP)
        n = 1 << depth
        if not cmap or len(cmap) < 3 * n:
            raise ValueError("palette TIFF without a full ColorMap")
        lut = (np.array(cmap[: 3 * n], dtype=np.uint32)
               .reshape(3, n).T >> 8).astype(np.uint8)
        idx = samples[..., 0]
        if int(idx.max(initial=0)) >= n:
            raise ValueError("TIFF palette index out of range")
        return lut[idx].copy()
    if depth == 16:
        samples = samples >> 8
    if photo == 2:
        return samples[..., :3].astype(np.uint8).copy()
    g = samples[..., 0]
    if depth < 8:
        g = g * 255 // ((1 << depth) - 1)
    if photo == 0:  # WhiteIsZero
        g = 255 - g
    return np.repeat(g.astype(np.uint8)[..., None], 3, axis=2)


def encode_tiff(pixels: np.ndarray, compression: str = "none",
                predictor: bool = False, rows_per_strip: int = 64) -> bytes:
    """(h, w, 3) uint8 RGB → little-endian strip TIFF bytes.

    ``compression``: 'none', 'packbits', 'lzw' or 'deflate';
    ``predictor`` applies horizontal differencing (decode exercises the
    cumulative-sum inverse)."""
    if compression not in ("none", "packbits", "lzw", "deflate"):
        raise ValueError(f"unsupported TIFF compression {compression!r}")
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    src = px.astype(np.int64)
    if predictor:
        src = src.copy()
        src[:, 1:] = (src[:, 1:] - src[:, :-1]) & 0xFF
    body = src.astype(np.uint8).reshape(h, w * 3)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        chunk = body[y0 : y0 + rows_per_strip].tobytes()
        if compression == "packbits":
            chunk = _packbits_encode(chunk)
        elif compression == "lzw":
            chunk = _tiff_lzw_encode(chunk)
        elif compression == "deflate":
            chunk = zlib.compress(chunk)
        strips.append(chunk)
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5, "deflate": 8}[compression]

    entries = []  # (tag, type, count, value_or_bytes)
    offsets_pos = []
    out = bytearray(b"II*\x00\x00\x00\x00\x00")

    def add(tag, typ, vals):
        entries.append((tag, typ, vals))

    add(_T_WIDTH, 4, [w])
    add(_T_HEIGHT, 4, [h])
    add(_T_BITS, 3, [8, 8, 8])
    add(_T_COMPRESSION, 3, [comp_id])
    add(_T_PHOTometric, 3, [2])
    add(_T_STRIP_OFFSETS, 4, [0] * len(strips))  # patched below
    add(_T_SPP, 3, [3])
    add(_T_ROWS_PER_STRIP, 4, [rows_per_strip])
    add(_T_STRIP_COUNTS, 4, [len(s) for s in strips])
    if predictor:
        add(_T_PREDICTOR, 3, [2])
    entries.sort()

    ifd_at = len(out)
    struct.pack_into("<I", out, 4, ifd_at)
    out += struct.pack("<H", len(entries))
    extra = bytearray()
    extra_base = ifd_at + 2 + 12 * len(entries) + 4
    for tag, typ, vals in entries:
        fmt = {3: "H", 4: "I"}[typ]
        size = _TYPE_SIZE[typ] * len(vals)
        packed = struct.pack("<" + str(len(vals)) + fmt, *vals)
        if size <= 4:
            vfield = packed + b"\x00" * (4 - size)
            if tag == _T_STRIP_OFFSETS:
                offsets_pos.append((len(out) + 8, False))
        else:
            if tag == _T_STRIP_OFFSETS:
                offsets_pos.append((extra_base + len(extra), True))
            vfield = struct.pack("<I", extra_base + len(extra))
            extra += packed
        out += struct.pack("<HHI", tag, typ, len(vals)) + vfield
    out += b"\x00\x00\x00\x00"  # next-IFD terminator
    out += extra
    strip_offsets = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s
    at, in_extra = offsets_pos[0]
    for k, so in enumerate(strip_offsets):
        struct.pack_into("<I", out, at + 4 * k, so)
    return bytes(out)
