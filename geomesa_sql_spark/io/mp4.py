"""ISO BMFF (MP4/MOV) container — Motion-JPEG tracks decode for real.

Closes the mp4 half of the video stub honestly (public ISO/IEC
14496-12 box structure; the reference engine, bxkftechteam/geomesa-sql,
has no media code — this is payload-side graft like io/containers.py's
RIFF/AVI walk):

- ``mp4_frames``: walks ftyp/moov/trak/mdia/minf/stbl, selects the
  first video ('vide') track, and extracts its samples in decode order
  via the stsc/stsz/stco(co64) tables. Sample entries 'jpeg'/'mjpa'
  (Motion-JPEG in MP4/MOV) return per-frame JPEG payloads that
  ``io/jpeg.py`` decodes — real video decode. Inter-frame codecs
  (avc1/hvc1/vp09/av01/mp4v...) raise NotImplementedError loudly:
  those need real motion-compensation decoders, not a container walk.
  Fragmented files (moof/mvex) raise too.
- ``encode_mjpeg_mp4``: minimal valid single-track MJPEG MP4 writer so
  tests exercise the parser against streams this module can actually
  build, plus hand-corrupted ones.
"""

from __future__ import annotations

import struct

from geomesa_sql_spark.io.errors import clean_decode

# sample-entry fourccs that are per-frame JPEG pictures
_JPEG_CODECS = (b"jpeg", b"mjpa", b"mjpb", b"MJPG")


def _boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, box_end); handles 64-bit largesize
    and size==0 (extends to the end of the enclosing box)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box header")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("MP4 box size runs past its container")
        yield typ, pos + hdr, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, fourcc: bytes):
    for typ, start, bend in _boxes(data, pos, end):
        if typ == fourcc:
            return start, bend
    return None


def _full_box(data: bytes, start: int):
    """(version, flags, payload_start) of a FullBox."""
    version = data[start]
    flags = int.from_bytes(data[start + 1 : start + 4], "big")
    return version, flags, start + 4


@clean_decode
def mp4_frames(data: bytes) -> list[bytes]:
    """MP4/MOV bytes -> list of JPEG frame payloads (video samples).

    Raises ValueError for non-BMFF input or malformed tables, and
    NotImplementedError for inter-frame codecs and fragmented files."""
    head = _find(data, 0, len(data), b"ftyp")
    if head is None:
        raise ValueError("not an ISO BMFF (MP4/MOV) file: no ftyp box")
    if _find(data, 0, len(data), b"moof") is not None:
        raise NotImplementedError("fragmented MP4 (moof): flat files only")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("MP4 without a moov box")
    if _find(data, moov[0], moov[1], b"mvex") is not None:
        raise NotImplementedError("fragmented MP4 (mvex): flat files only")

    stbl = None
    for typ, tstart, tend in _boxes(data, moov[0], moov[1]):
        if typ != b"trak":
            continue
        mdia = _find(data, tstart, tend, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
        if hdlr is None:
            continue
        _v, _f, p = _full_box(data, hdlr[0])
        handler = data[p + 4 : p + 8]
        if handler != b"vide":
            continue
        minf = _find(data, mdia[0], mdia[1], b"minf")
        if minf is None:
            raise ValueError("video trak without a minf box")
        stbl = _find(data, minf[0], minf[1], b"stbl")
        if stbl is None:
            raise ValueError("video trak without a stbl box")
        break
    if stbl is None:
        raise ValueError("MP4 with no video track")

    # stsd: codec gate
    stsd = _find(data, stbl[0], stbl[1], b"stsd")
    if stsd is None:
        raise ValueError("stbl without a stsd box")
    _v, _f, p = _full_box(data, stsd[0])
    (n_entries,) = struct.unpack_from(">I", data, p)
    if n_entries < 1:
        raise ValueError("stsd with no sample entries")
    codec = data[p + 8 : p + 12]
    if codec not in _JPEG_CODECS:
        raise NotImplementedError(
            f"MP4 video codec {codec!r}: only Motion-JPEG sample entries "
            "are implemented (H.264/HEVC/VP9/AV1 need real inter-frame "
            "decoders)")

    def _table(fourcc: bytes, entry_words: int):
        box = _find(data, stbl[0], stbl[1], fourcc)
        if box is None:
            return None
        _v, _f, q = _full_box(data, box[0])
        (cnt,) = struct.unpack_from(">I", data, q)
        need = q + 4 + 4 * entry_words * cnt
        if need > box[1]:
            raise ValueError(f"MP4 {fourcc.decode()} table runs past its box")
        vals = struct.unpack_from(f">{entry_words * cnt}I", data, q + 4)
        return [tuple(vals[k : k + entry_words])
                for k in range(0, len(vals), entry_words)]

    # sample sizes
    stsz = _find(data, stbl[0], stbl[1], b"stsz")
    if stsz is None:
        raise ValueError("stbl without a stsz box")
    _v, _f, q = _full_box(data, stsz[0])
    uniform, n_samples = struct.unpack_from(">II", data, q)
    if n_samples > 1_000_000:
        raise ValueError("implausible MP4 sample count")
    if uniform:
        sizes = [uniform] * n_samples
    else:
        if q + 8 + 4 * n_samples > stsz[1]:
            raise ValueError("MP4 stsz table runs past its box")
        sizes = list(struct.unpack_from(f">{n_samples}I", data, q + 8))

    # chunk offsets (stco 32-bit or co64)
    chunks = _table(b"stco", 1)
    if chunks is not None:
        chunk_offsets = [c[0] for c in chunks]
    else:
        co64 = _find(data, stbl[0], stbl[1], b"co64")
        if co64 is None:
            raise ValueError("stbl without stco/co64")
        _v, _f, q = _full_box(data, co64[0])
        (cnt,) = struct.unpack_from(">I", data, q)
        if q + 4 + 8 * cnt > co64[1]:
            raise ValueError("MP4 co64 table runs past its box")
        chunk_offsets = list(struct.unpack_from(f">{cnt}Q", data, q + 4))

    stsc = _table(b"stsc", 3)
    if not stsc:
        raise ValueError("stbl without a stsc box")
    # expand stsc runs: entry k applies from first_chunk_k until the next
    spc_per_chunk = []
    for k, (first, spc, _desc) in enumerate(stsc):
        if first < 1 or (k and first <= stsc[k - 1][0]):
            raise ValueError("MP4 stsc first_chunk not increasing")
        last = stsc[k + 1][0] - 1 if k + 1 < len(stsc) else len(chunk_offsets)
        spc_per_chunk += [spc] * (last - first + 1)
    if len(spc_per_chunk) != len(chunk_offsets):
        raise ValueError("MP4 stsc does not cover the chunk list")

    frames: list[bytes] = []
    si = 0
    for off, spc in zip(chunk_offsets, spc_per_chunk):
        for _ in range(spc):
            if si >= n_samples:
                break
            size = sizes[si]
            if off + size > len(data):
                raise ValueError("MP4 sample runs off the end of the file")
            frames.append(data[off : off + size])
            off += size
            si += 1
    if si < n_samples:
        raise ValueError("MP4 chunk map covers fewer samples than stsz")
    return frames


# ---------------------------------------------------------------------------
# writer


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, bytes([version]) + flags.to_bytes(3, "big") + payload)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mjpeg_mp4(jpeg_frames: list[bytes], w: int, h: int,
                     fps: int = 25) -> bytes:
    """JPEG frame payloads -> minimal valid single-track MJPEG MP4.

    Layout: ftyp + mdat (all samples, one chunk) + moov; stco points at
    the mdat payload, stsc maps one chunk holding every sample."""
    n = len(jpeg_frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(jpeg_frames)
    mdat = _box(b"mdat", mdat_payload)
    chunk_off = len(ftyp) + 8  # first sample byte inside mdat

    dur = n  # timescale == fps, one tick per frame
    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, fps, dur) + struct.pack(">iHH", 0x10000, 0x0100, 0)
        + b"\x00" * 8 + _MATRIX + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, dur) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0) + _MATRIX
        + struct.pack(">II", w << 16, h << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, fps, dur, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"MJPEG\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    entry = _box(b"jpeg", (
        b"\x00" * 6 + struct.pack(">H", 1)            # data_reference_index
        + b"\x00" * 16                                 # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
        + b"\x05MJPEG" + b"\x00" * 26                  # 32-byte compressorname
        + struct.pack(">Hh", 24, -1)))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, max(n, 1), 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + struct.pack(f">{n}I", *[len(f) for f in jpeg_frames]))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
