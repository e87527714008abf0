"""EXIF metadata: parse and write the APP1/TIFF-IFD structure.

EXIF (CIPA DC-008) embeds a classic TIFF structure — byte-order
header, IFD0, an Exif sub-IFD, and a GPS sub-IFD — either as a JPEG
APP1 segment prefixed ``Exif\\0\\0`` or as the TIFF file itself. The
reader reuses the from-scratch TIFF machinery (`io.tiff._header` /
`_read_ifd`, which already decodes RATIONALs to floats), so there is
exactly one IFD walker in the repo; the writer here is the tiny
inverse used to synthesize geotagged fixtures and to let pipelines
stamp coordinates back into payloads.

This is the image↔geospatial bridge: ``ops.multimodal.image_exif``
lifts GPS IFD tags into ``exif_lon``/``exif_lat`` DOUBLE columns that
feed the engine's spatial surface directly (spatial_join, dbscan
``metric='sphere'``, tiling). The reference has no EXIF support (it
is a query adapter, SURVEY.md §2); PostGIS users get the analogous
bridge from raster importers.

Parsing is defensive: anything not carrying well-formed EXIF —
no APP1, truncated IFDs, absent GPS tags — yields ``None`` fields,
never an exception (the per-row contract every multimodal operator
here follows).
"""

from __future__ import annotations

import struct

from geomesa_sql_spark.io.images import PNG_SIG as _PNG_SIG
from geomesa_sql_spark.io.tiff import _header, _read_ifd

# IFD0 / Exif-IFD tags
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_PTR = 0x8769
_TAG_GPS_PTR = 0x8825
_TAG_DATETIME_ORIGINAL = 0x9003
# GPS IFD tags
_GPS_LAT_REF = 1
_GPS_LAT = 2
_GPS_LON_REF = 3
_GPS_LON = 4
_GPS_ALT_REF = 5
_GPS_ALT = 6

_T_BYTE, _T_ASCII, _T_SHORT, _T_LONG, _T_RATIONAL = 1, 2, 3, 4, 5


def _int1(vals) -> int | None:
    """First value as int, or None — a type-confused tag (SHORT
    declared as ASCII etc.) delivers bytes, and int(b'..') raising
    out of one field must not void the whole parse."""
    try:
        return int(vals[0])
    except (TypeError, ValueError, IndexError):
        return None


def _float1(vals) -> float | None:
    try:
        return float(vals[0])
    except (TypeError, ValueError, IndexError):
        return None


def _ascii(vals) -> str | None:
    if not vals:
        return None
    raw = vals[0]
    if not isinstance(raw, bytes):
        return None
    s = raw.split(b"\x00", 1)[0].decode("ascii", "replace").strip()
    return s or None


def _dms(vals, ref) -> float | None:
    """[deg, min, sec] rationals + 'N'/'S'/'E'/'W' ref → signed
    decimal degrees; None on type-confused values."""
    if not vals or len(vals) < 3:
        return None
    try:
        deg = (
            float(vals[0]) + float(vals[1]) / 60.0 + float(vals[2]) / 3600.0
        )
    except (TypeError, ValueError):
        return None
    r = ref[0] if ref else None
    if isinstance(r, bytes) and r[:1] in (b"S", b"W"):
        deg = -deg
    return deg


def _parse_tiff_exif(t: bytes) -> dict | None:
    try:
        bo, big, off = _header(t)
        ifd0 = _read_ifd(t, bo, off, big)
        exif_ifd: dict = {}
        gps: dict = {}
        if _TAG_EXIF_PTR in ifd0:
            exif_ifd = _read_ifd(t, bo, int(ifd0[_TAG_EXIF_PTR][0]), big)
        if _TAG_GPS_PTR in ifd0:
            gps = _read_ifd(t, bo, int(ifd0[_TAG_GPS_PTR][0]), big)
    except (ValueError, struct.error):
        return None
    alt = _float1(gps.get(_GPS_ALT)) if gps.get(_GPS_ALT) else None
    if alt is not None and _int1(gps.get(_GPS_ALT_REF) or []) == 1:
        alt = -alt  # 1 = below sea level
    return {
        "lon": _dms(gps.get(_GPS_LON), gps.get(_GPS_LON_REF)),
        "lat": _dms(gps.get(_GPS_LAT), gps.get(_GPS_LAT_REF)),
        "alt": alt,
        "orientation": _int1(ifd0.get(_TAG_ORIENTATION) or []),
        "make": _ascii(ifd0.get(_TAG_MAKE)),
        "model": _ascii(ifd0.get(_TAG_MODEL)),
        "datetime": _ascii(exif_ifd.get(_TAG_DATETIME_ORIGINAL))
        or _ascii(ifd0.get(_TAG_DATETIME)),
    }



def _png_chunks(data: bytes, base: int = 0):
    """([(start, end, type)], stop) — every well-formed chunk of the
    PNG whose signature sits at ``base``, INCLUDING chunk-shaped bytes
    after IEND (a favorite hiding spot for trailer metadata); stops at
    the first malformed length. Absolute offsets, so multi-container
    scans never slice. One walker shared by parse and scrub so their
    container bounds can never diverge."""
    out = []
    i = base + 8
    while i + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, i)
        typ = data[i + 4 : i + 8]
        if ln > len(data) - i - 8:
            break
        end = i + 12 + ln  # len + type + data + crc
        out.append((i, end, typ))
        i = end
    return out, i


def _jpeg_segments(data: bytes, base: int = 0):
    """([(start, end, marker)], stop) — the header segments of the
    JPEG whose SOI sits at ``base``: fill bytes (B.1.1.2) skipped,
    standalone markers kept, stops before entropy data (SOS) / EOI /
    the first malformed length. Absolute offsets; shared by parse and
    scrub."""
    out = []
    i = base + 2
    while i + 4 <= len(data) and data[i] == 0xFF:
        m = data[i + 1]
        if m == 0xFF:  # fill byte: the marker starts one byte later
            i += 1
            continue
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            out.append((i, i + 2, m))
            i += 2
            continue
        if m in (0xDA, 0xD9):  # entropy data / EOI: no headers left
            break
        (ln,) = struct.unpack_from(">H", data, i + 2)
        if ln < 2 or i + 2 + ln > len(data):
            break
        out.append((i, i + 2 + ln, m))
        i += 2 + ln
    return out, i


def _is_exif_app1(data: bytes, s: int, m: int) -> bool:
    return m == 0xE1 and data[s + 4 : s + 10] == b"Exif\x00\x00"


def parse_exif(data: bytes | None) -> dict | None:
    """EXIF fields from a JPEG (APP1 walk), a PNG (the standardized
    ``eXIf`` chunk, PNG extension 1.5.0 / core since the 2022 spec),
    or a bare TIFF.

    Returns {lon, lat, alt, orientation, make, model, datetime} with
    ``None`` for anything absent, or ``None`` when the payload carries
    no parseable EXIF at all. Never raises on corrupt input."""
    if not data or len(data) < 4:
        return None
    if data[:8] == _PNG_SIG:
        for s, e, typ in _png_chunks(data)[0]:
            if typ == b"eXIf":
                return _parse_tiff_exif(data[s + 8 : e - 4])
        return None
    if data[:2] == b"\xff\xd8":
        for s, e, m in _jpeg_segments(data)[0]:
            if _is_exif_app1(data, s, m):
                return _parse_tiff_exif(data[s + 10 : e])
        return None
    if data[:2] in (b"II", b"MM"):
        return _parse_tiff_exif(data)
    return None


def _tiff_gps_patches(data: bytes, base: int) -> list[tuple[int, bytes]]:
    """Zero-patches (absolute offset, zero bytes) removing every GPS
    IFD reachable from the TIFF at ``base``: for EACH IFD in the
    next-IFD chain (GPS hidden in IFD1 is as readable as in IFD0 —
    r5 review), the GPS pointer entry, the GPS entry table, and every
    out-of-line GPS value. In-place zeroing shifts no offsets, so the
    rest of the TIFF stays valid; non-GPS fields (camera make,
    timestamps) survive: the scrub targets location PII. Returns []
    when there is nothing to scrub or the structure is malformed."""
    from geomesa_sql_spark.io.tiff import _ifd_offsets, _ifd_spans

    t = data if base == 0 else bytes(data[base:])
    try:
        bo, big, off = _header(t)
    except (ValueError, struct.error):
        return []
    # lenient walks throughout (r5 review): a hostile next-IFD link,
    # inflated entry count, or out-of-bounds value must not void the
    # zeroing of everything VALID around it — the pointer entry is
    # always killed first, then whatever GPS bytes are addressable
    try:
        chain = _ifd_offsets(t, bo, big, off, strict=False)
    except (ValueError, struct.error):
        chain = [off]
    patches: list[tuple[int, bytes]] = []
    ent_sz = 20 if big else 12
    for ifd_off in chain:
        try:
            _, spans0 = _ifd_spans(t, bo, ifd_off, big, strict=False)
        except (ValueError, struct.error):
            continue
        gps_off = None
        for tag, typ, _cnt, entry_at, vat, total in spans0:
            if tag != _TAG_GPS_PTR:
                continue
            patches.append((base + entry_at, b"\x00" * ent_sz))
            if gps_off is None and total:
                try:
                    fmt = {3: "H", 4: "I", 16: "Q"}.get(typ, "I")
                    (gps_off,) = struct.unpack_from(bo + fmt, t, vat)
                except struct.error:
                    gps_off = None
        if gps_off is None:
            continue
        try:
            gps_block, gps_spans = _ifd_spans(
                t, bo, int(gps_off), big, strict=False
            )
        except (ValueError, struct.error):
            continue
        patches.append(
            (base + gps_block[0], b"\x00" * (gps_block[1] - gps_block[0]))
        )
        for _tag, _typ, _cnt, _at, vat, total in gps_spans:
            if total:
                patches.append((base + vat, b"\x00" * total))
    return patches


def strip_exif(data: bytes | None) -> tuple[bytes | None, bool]:
    """(payload without EXIF location data, changed?) — the privacy
    scrub: walks the payload as a SEQUENCE of containers (a second
    JPEG/PNG after the first image's EOI/IEND — the classic hiding
    spot file carvers scan — is scrubbed too, iteratively, so a
    degenerate thousand-member chain costs O(n) and cannot overflow
    the stack). Per member: every Exif APP1 segment of a JPEG and
    every ``eXIf`` chunk of a PNG (chunk-shaped trailers after IEND
    included) is removed; a bare TIFF gets every GPS IFD reachable
    from its next-IFD chain zeroed in place — and, because a TIFF is
    not self-delimiting (its extent cannot be known without trusting
    arbitrary internal offsets), a TIFF member ends the structural
    scan: bytes after it pass through unexamined. All other bytes —
    JFIF/XMP APP1s, entropy data, ancillary chunks, unstructured
    trailers — are untouched, and the nothing-to-scrub path returns
    the input object itself (zero copies). Never raises on corrupt
    input. Inverse law (tested):
    strip_exif(inject_exif_*(x)) == (x, True)."""
    if not data or len(data) < 4:
        return data, False
    spans: list[tuple[int, int]] = []
    patches: list[tuple[int, bytes]] = []
    pos = 0
    while pos is not None and len(data) - pos >= 4:
        nxt = None
        if data[pos : pos + 8] == _PNG_SIG:
            chunks, stop = _png_chunks(data, pos)
            spans += [(s, e) for s, e, t in chunks if t == b"eXIf"]
            nxt = stop
        elif data[pos : pos + 2] == b"\xff\xd8":
            segs, stop = _jpeg_segments(data, pos)
            spans += [
                (s, e) for s, e, m in segs if _is_exif_app1(data, s, m)
            ]
            # inside entropy-coded data every 0xFF is byte-stuffed
            # (FF00) or a RST marker, so the first FF D9 at/after the
            # headers is the true EOI — the next member starts there
            eoi = data.find(b"\xff\xd9", stop)
            nxt = eoi + 2 if eoi != -1 else None
        elif data[pos : pos + 2] in (b"II", b"MM"):
            patches += _tiff_gps_patches(data, pos)
            nxt = None  # extent unknowable: scan ends (docstring)
        else:
            break  # unstructured trailer bytes pass through
        if nxt is None or nxt <= pos:
            break
        pos = nxt
    if not spans and not patches:
        return data, False
    buf = bytearray(data)
    for at, zeros in patches:
        buf[at : at + len(zeros)] = zeros
    out = bytearray()
    prev = 0
    for s, e in sorted(spans):
        out += buf[prev:s]
        prev = e
    out += buf[prev:]
    return bytes(out), True


def _rat(v: float, den: int) -> tuple[int, int]:
    return int(round(v * den)), den


def _deg_to_dms_rats(deg: float) -> list[tuple[int, int]]:
    """|degrees| → [(d,1), (m,1), (sec·1e6, 1e6)] — sub-microsecond
    arc precision, every numerator < 2^32."""
    a = abs(deg)
    d = int(a)
    m = int((a - d) * 60.0)
    s = (a - d) * 3600.0 - m * 60.0
    return [(d, 1), (m, 1), _rat(s, 1_000_000)]


def build_exif_tiff(
    lon: float | None = None,
    lat: float | None = None,
    alt: float | None = None,
    orientation: int | None = None,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
    byte_order: str = "II",
) -> bytes:
    """Serialize EXIF fields as a classic TIFF block (the APP1 payload
    after ``Exif\\0\\0``; also a valid input to :func:`parse_exif`).
    ``byte_order`` 'II' (little) or 'MM' (big)."""
    bo = "<" if byte_order == "II" else ">"

    def entries_size(n: int) -> int:
        return 2 + 12 * n + 4

    def ascii_val(s: str) -> bytes:
        return s.encode("ascii") + b"\x00"

    ifd0: list[tuple[int, int, object]] = []
    if make is not None:
        ifd0.append((_TAG_MAKE, _T_ASCII, ascii_val(make)))
    if model is not None:
        ifd0.append((_TAG_MODEL, _T_ASCII, ascii_val(model)))
    if orientation is not None:
        ifd0.append((_TAG_ORIENTATION, _T_SHORT, [int(orientation)]))
    exif_ifd: list[tuple[int, int, object]] = []
    if datetime is not None:
        exif_ifd.append(
            (_TAG_DATETIME_ORIGINAL, _T_ASCII, ascii_val(datetime))
        )
    gps: list[tuple[int, int, object]] = []
    if lat is not None:
        gps.append((_GPS_LAT_REF, _T_ASCII, b"N\x00" if lat >= 0 else b"S\x00"))
        gps.append((_GPS_LAT, _T_RATIONAL, _deg_to_dms_rats(lat)))
    if lon is not None:
        gps.append((_GPS_LON_REF, _T_ASCII, b"E\x00" if lon >= 0 else b"W\x00"))
        gps.append((_GPS_LON, _T_RATIONAL, _deg_to_dms_rats(lon)))
    if alt is not None:
        gps.append((_GPS_ALT_REF, _T_BYTE, [1 if alt < 0 else 0]))
        gps.append((_GPS_ALT, _T_RATIONAL, [_rat(abs(alt), 1000)]))
    gps.sort()
    exif_ifd.sort()

    # pointer tags go into IFD0 once the sub-IFD offsets are known;
    # sizes are fixed by entry counts, so lay out header → IFD0 →
    # ExifIFD → GPSIFD → value heap
    n0 = len(ifd0) + (1 if exif_ifd else 0) + (1 if gps else 0)
    ifd0_off = 8
    exif_off = ifd0_off + entries_size(n0)
    gps_off = exif_off + (entries_size(len(exif_ifd)) if exif_ifd else 0)
    heap_off = gps_off + (entries_size(len(gps)) if gps else 0)

    heap = bytearray()

    def pack_vals(typ: int, vals) -> bytes:
        if typ == _T_ASCII:
            return bytes(vals)
        if typ == _T_BYTE:
            return bytes(int(v) for v in vals)
        if typ == _T_SHORT:
            return struct.pack(bo + f"{len(vals)}H", *[int(v) for v in vals])
        if typ == _T_LONG:
            return struct.pack(bo + f"{len(vals)}I", *[int(v) for v in vals])
        out = b""
        for num, den in vals:
            out += struct.pack(bo + "II", num, den)
        return out

    def ser_ifd(entries) -> bytes:
        buf = struct.pack(bo + "H", len(entries))
        for tag, typ, vals in sorted(entries):
            # ASCII values arrive as nul-terminated bytes, so len()
            # is the byte count the spec wants; every other type's
            # count is its element count
            count = len(vals)
            raw = pack_vals(typ, vals)
            if len(raw) <= 4:
                vfield = raw + b"\x00" * (4 - len(raw))
            else:
                vfield = struct.pack(bo + "I", heap_off + len(heap))
                heap.extend(raw)
            buf += struct.pack(bo + "HHI", tag, typ, count) + vfield
        return buf + struct.pack(bo + "I", 0)  # no next IFD

    full0 = list(ifd0)
    if exif_ifd:
        full0.append((_TAG_EXIF_PTR, _T_LONG, [exif_off]))
    if gps:
        full0.append((_TAG_GPS_PTR, _T_LONG, [gps_off]))

    header = byte_order.encode("ascii") + struct.pack(bo + "HI", 42, 8)
    body = ser_ifd(full0)
    if exif_ifd:
        body += ser_ifd(exif_ifd)
    if gps:
        body += ser_ifd(gps)
    return header + body + bytes(heap)


def build_gps_tiff_batch(lon, lat, alt=None):
    """(g, L) uint8 matrix of EXIF TIFF blocks — the vectorized twin of
    ``build_exif_tiff(lon=…, lat=…[, alt=…])`` for the geotag hot path
    (guide §4.2: the per-row builder's dozens of struct.pack calls were
    ~90% of the inject cost). Rows are byte-identical to the scalar
    builder (pinned by tests/test_exif_batch.py): the fixed layout is
    taken from ONE scalar template call, and only the hemisphere refs
    and DMS rationals are patched per row with the same truncate/round
    arithmetic. ``alt`` present means every row carries an altitude —
    the caller splits mixed batches."""
    import numpy as np

    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    g = len(lon)
    tmpl = np.frombuffer(
        build_exif_tiff(
            lon=0.0, lat=0.0, alt=0.0 if alt is not None else None
        ),
        dtype=np.uint8,
    )
    out = np.tile(tmpl, (g, 1))
    # layout: header 8B → IFD0 (1 entry: GPS pointer) 18B → GPS IFD at
    # 26 with entries sorted by tag (latref, lat, lonref, lon[, altref,
    # alt]) → value heap (lat rats 24B, lon rats 24B[, alt rat 8B])
    gps = 26
    nent = 6 if alt is not None else 4
    heap = gps + 2 + 12 * nent + 4
    ref_off = gps + 2 + 8  # value field of entry 0 (latref)
    out[:, ref_off] = np.where(lat >= 0, ord("N"), ord("S"))
    out[:, ref_off + 2 * 12] = np.where(lon >= 0, ord("E"), ord("W"))

    def dms_rats(v):
        # same ops as _deg_to_dms_rats: int() truncation ≡ floor for
        # the non-negative |deg|, round() ≡ np.round (half-even)
        a = np.abs(v)
        d = np.floor(a)
        m = np.floor((a - d) * 60.0)
        s6 = np.round(((a - d) * 3600.0 - m * 60.0) * 1_000_000.0)
        one = np.ones(g)
        return np.stack(
            [d, one, m, one, s6, np.full(g, 1_000_000.0)], axis=1
        ).astype("<u4")

    out[:, heap : heap + 24] = dms_rats(lat).view(np.uint8)
    out[:, heap + 24 : heap + 48] = dms_rats(lon).view(np.uint8)
    if alt is not None:
        alt = np.asarray(alt, dtype=np.float64)
        out[:, ref_off + 4 * 12] = (alt < 0).astype(np.uint8)
        rat = np.stack(
            [np.round(np.abs(alt) * 1000.0), np.full(g, 1000.0)], axis=1
        ).astype("<u4")
        out[:, heap + 48 : heap + 56] = rat.view(np.uint8)
    return out


def inject_exif_png(png: bytes, **fields) -> bytes:
    """A copy of ``png`` with an ``eXIf`` chunk (built from ``fields``
    — see :func:`build_exif_tiff`) inserted after IHDR. Ancillary and
    lowercase-first, so spec-conforming decoders that predate eXIf
    skip it."""
    import zlib

    if png[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    if len(png) < 16 or png[12:16] != b"IHDR":
        raise ValueError("truncated PNG (no IHDR)")
    (ihdr_len,) = struct.unpack_from(">I", png, 8)
    end = 8 + 12 + ihdr_len  # IHDR is always the first chunk
    # a hostile/corrupt length would place the chunk at a garbage
    # offset (and the subsequent parse would read NULLs) — refuse
    # instead, so callers fall back to untagged pass-through
    if ihdr_len != 13 or end > len(png):
        raise ValueError("implausible PNG IHDR")
    block = build_exif_tiff(**fields)
    body = b"eXIf" + block
    chunk = (
        struct.pack(">I", len(block))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )
    return png[:end] + chunk + png[end:]


def inject_exif_jpeg(jpeg: bytes, **fields) -> bytes:
    """A copy of ``jpeg`` with an EXIF APP1 segment (built from
    ``fields`` — see :func:`build_exif_tiff`) inserted after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    payload = b"Exif\x00\x00" + build_exif_tiff(**fields)
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("EXIF payload exceeds the APP1 segment limit")
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]
