"""Ogg container (RFC 3533) — FLAC-in-Ogg decodes for real.

Payload-side graft like io/containers.py's RIFF walk (the reference
engine has no media code). The page/packet layer is fully parsed —
capture pattern, lacing reassembly across pages, continuation flags,
per-page CRC-32 (the Ogg polynomial, non-reflected), multiplexed
streams — and the codec mapping dispatches on the first packet:

- ``FLAC`` (the Ogg-FLAC mapping, 0x7F 'FLAC'): the ID packet embeds a
  native fLaC header and every audio packet is one FLAC frame, so the
  reassembled stream feeds ``io/flac.py`` unchanged — CRC-8/16 and the
  STREAMINFO MD5 still verify. Real compressed audio decode.
- ``\\x01vorbis`` / ``OpusHead`` raise NotImplementedError loudly:
  those need MDCT/psychoacoustic codecs, not a container walk.

``encode_ogg_flac`` wraps the module's own FLAC encoder page-by-page
(one frame per packet, per the mapping spec) so tests exercise the
parser against streams this module can actually build.
"""

from __future__ import annotations

import struct

import numpy as np

from geomesa_sql_spark.io.errors import clean_decode

# Ogg CRC-32: poly 0x04C11DB7, no reflection, init 0, xorout 0
_CRC_TABLE = np.zeros(256, dtype=np.uint32)
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
    _CRC_TABLE[_i] = _r & 0xFFFFFFFF


def _ogg_crc(data: bytes) -> int:
    crc = 0
    tbl = _CRC_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ int(tbl[((crc >> 24) ^ b) & 0xFF])
    return crc


def ogg_packets(data: bytes) -> dict[int, list[bytes]]:
    """Ogg bytes -> {serial: [packet, ...]} in stream order.

    Verifies every page's CRC and the capture pattern; packets spanning
    pages reassemble via the continuation flag. A continuation flag
    that contradicts the partial-packet state raises (corrupt mux)."""
    if len(data) < 27 or data[:4] != b"OggS":
        raise ValueError("not an Ogg container (no OggS capture pattern)")
    streams: dict[int, list[bytes]] = {}
    partial: dict[int, bytearray] = {}
    pos = 0
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS":
            raise ValueError("Ogg page without the OggS capture pattern")
        if data[pos + 4] != 0:
            raise ValueError(f"Ogg stream structure version {data[pos + 4]}")
        htype = data[pos + 5]
        (serial,) = struct.unpack_from("<I", data, pos + 14)
        (crc,) = struct.unpack_from("<I", data, pos + 22)
        nseg = data[pos + 26]
        seg_at = pos + 27
        if seg_at + nseg > len(data):
            raise ValueError("truncated Ogg page header")
        lacing = data[seg_at : seg_at + nseg]
        body_at = seg_at + nseg
        body_len = sum(lacing)
        if body_at + body_len > len(data):
            raise ValueError("truncated Ogg page body")
        page = bytearray(data[pos : body_at + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        packets = streams.setdefault(serial, [])
        buf = partial.setdefault(serial, bytearray())
        if (htype & 1) and not buf:
            raise ValueError("Ogg continuation page without a pending packet")
        if not (htype & 1) and buf:
            raise ValueError("Ogg packet left unterminated by the prior page")
        at = body_at
        for k, lace in enumerate(lacing):
            buf += data[at : at + lace]
            at += lace
            if lace < 255:  # packet terminates here
                packets.append(bytes(buf))
                buf.clear()
        pos = body_at + body_len
    if pos != len(data):
        raise ValueError("trailing garbage after the last Ogg page")
    for serial, buf in partial.items():
        if buf:
            raise ValueError("Ogg stream ends mid-packet")
    return streams


@clean_decode
def decode_ogg(data: bytes) -> tuple[np.ndarray, int]:
    """Ogg bytes -> ((n, channels) int samples, sample_rate).

    Decodes the first stream with a known mapping. FLAC-in-Ogg is real
    (reassembled into a native stream for io/flac.py — frame CRCs and
    the STREAMINFO MD5 verify); Vorbis and Opus raise loudly."""
    from geomesa_sql_spark.io.flac import decode_flac

    streams = ogg_packets(data)
    for serial, packets in streams.items():
        if not packets:
            continue
        first = packets[0]
        if first[:5] == b"\x7fFLAC":
            if len(first) < 13 or first[9:13] != b"fLaC":
                raise ValueError("malformed Ogg-FLAC identification packet")
            n_headers = struct.unpack_from(">H", first, 7)[0]
            header = bytearray(first[9:])
            if len(header) < 9:
                raise ValueError("Ogg-FLAC ID packet without STREAMINFO")
            header[4] |= 0x80  # force last-metadata: trailing headers skipped
            rest = packets[1:]
            if n_headers:
                rest = rest[n_headers:]
            # header count 0 = unknown: metadata packets never start
            # with the 14-bit frame sync, so the filter drops them (and
            # stray non-audio packets) either way
            audio = [
                p for p in rest
                if len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xFC) == 0xF8
            ]
            return decode_flac(bytes(header) + b"".join(audio))
        if first[:7] == b"\x01vorbis":
            raise NotImplementedError(
                "Ogg Vorbis needs a real MDCT codec (absent); the container "
                "walk and the FLAC mapping are implemented")
        if first[:8] == b"OpusHead":
            raise NotImplementedError(
                "Ogg Opus needs a real codec (absent); the container walk "
                "and the FLAC mapping are implemented")
    raise ValueError("Ogg container with no known stream mapping")


def encode_ogg_flac(samples: np.ndarray, rate: int, bps: int = 16,
                    block_size: int = 4096) -> bytes:
    """(n,) or (n, channels) ints -> Ogg-FLAC bytes (the mapping spec:
    ID packet with embedded native header, one FLAC frame per audio
    packet, granule = last sample position)."""
    import hashlib

    from geomesa_sql_spark.io.flac import (
        BitWriter,
        _encode_frame,
        _pcm_bytes,
    )

    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    info = BitWriter()
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(rate, 20)
    info.write(channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    streaminfo = info.getvalue() + hashlib.md5(_pcm_bytes(x, bps)).digest()
    native_header = (b"fLaC" + bytes([0x80])
                     + len(streaminfo).to_bytes(3, "big") + streaminfo)
    frames = []
    done = 0
    for fno, start in enumerate(range(0, max(n, 1), block_size)):
        blk = x[start : start + block_size]
        if len(blk) == 0:
            break
        frames.append((_encode_frame(blk, fno, rate, bps, channels,
                                     0, 8, "auto"), done + len(blk)))
        done += len(blk)

    id_packet = (b"\x7fFLAC\x01\x00" + struct.pack(">H", 0) + native_header)
    serial = 0x53474F31
    out = bytearray()
    seq = 0
    chunk = _ogg_pages(serial, seq, 0, id_packet, first_htype=2)  # BOS
    out += chunk[0]
    seq = chunk[1]
    for k, (frame, granule) in enumerate(frames):
        last = k == len(frames) - 1
        chunk = _ogg_pages(serial, seq, granule, frame,
                           last_htype=4 if last else 0)  # EOS on the last
        out += chunk[0]
        seq = chunk[1]
    return bytes(out)


def _ogg_pages(serial: int, seq: int, granule: int, packet: bytes,
               first_htype: int = 0, last_htype: int = 0
               ) -> tuple[bytes, int]:
    """One packet -> one or more pages (continuation pages when the
    lacing would exceed 255 segments). Returns (pages, next_seq)."""
    q, r = divmod(len(packet), 255)
    lacing = b"\xff" * q + bytes([r])
    out = bytearray()
    at = 0
    first = True
    while lacing:
        seg, lacing = lacing[:255], lacing[255:]
        body_len = sum(seg)
        htype = (first_htype if first else 1)  # continuation flag
        if not lacing:
            htype |= last_htype
        # pages that don't complete the packet carry granule -1 (RFC 3533)
        gran = granule if not lacing else -1
        hdr = (b"OggS" + bytes([0, htype])
               + struct.pack("<qIII", gran, serial, seq, 0)
               + bytes([len(seg)]) + seg)
        page = bytearray(hdr + packet[at : at + body_len])
        struct.pack_into("<I", page, 22, _ogg_crc(bytes(page)))
        out += page
        at += body_len
        seq += 1
        first = False
    return bytes(out), seq
