"""RIFF media containers — WAV (PCM audio) and MJPEG AVI (video).

Closes two more honest stubs in the multimodal ops with pure
stdlib/numpy parsers (public container specs; the reference engine,
bxkftechteam/geomesa-sql, has no media code — this is graft-side):

- ``wav``: RIFF/WAVE, PCM format 1, 16-bit — `audio_features` runs on
  real .wav payloads instead of only bare ``raws16le`` sample dumps.
  Float/ADPCM/extensible formats raise loudly.
- ``mjpeg``: RIFF/AVI whose video stream is Motion-JPEG — every frame
  is a baseline JFIF picture, so `io/jpeg.py` decodes real video.
  mp4/webm (H.264/VP9) still raise: those need real inter-frame
  codecs, not a container walk.

Both directions are provided so tests exercise the parsers against
streams this container can actually build, plus hand-corrupted ones.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# RIFF walking


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size); RIFF pads to even."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


# ---------------------------------------------------------------------------
# WAV


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, channels) int16 samples, sample_rate).

    PCM format 1, 16-bit only; anything else raises loudly
    (NotImplementedError for known-but-unsupported codecs, ValueError
    for malformed containers).
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (RIFF/WAVE) container")
    fmt = None
    samples = None
    for fourcc, start, size in _riff_chunks(data, 12, len(data)):
        if fourcc == b"fmt ":
            if size < 16 or start + 16 > len(data):
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", data, start)
        elif fourcc == b"data":
            if start + size > len(data):
                raise ValueError("truncated WAV data chunk")
            samples = data[start : start + size]
    if fmt is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format {audio_format} / {bits}-bit: only PCM 16-bit is "
            "implemented (float/ADPCM need codec tables)"
        )
    if channels < 1:
        raise ValueError("WAV with zero channels")
    n = len(samples) // (2 * channels)
    x = np.frombuffer(samples, dtype="<i2", count=n * channels)
    return x.reshape(n, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, channels) int16 -> WAV bytes (PCM 16-bit)."""
    x = np.asarray(samples, dtype="<i2")
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    payload = x.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ---------------------------------------------------------------------------
# MJPEG AVI


def mjpeg_avi_frames(data: bytes) -> list[bytes]:
    """AVI bytes -> list of JPEG frame payloads (video stream chunks).

    Walks RIFF lists for 'movi' and collects compressed ('##dc') and
    uncompressed-tagged ('##db') video chunks in file order. Raises
    ValueError for non-AVI containers and NotImplementedError when the
    video stream declares a non-MJPG codec.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] not in (b"AVI ", b"AVIX"):
        raise ValueError("not an AVI (RIFF/AVI ) container")
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        for fourcc, start, size in _riff_chunks(data, pos, end):
            if fourcc == b"LIST":
                list_type = data[start : start + 4]
                if list_type in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk(start + 4, start + size)
            elif fourcc == b"strh":
                # stream header: type 'vids' + codec fourcc
                if data[start : start + 4] == b"vids":
                    codec = data[start + 4 : start + 8]
                    if codec not in (b"MJPG", b"mjpg", b"jpeg", b"\x00\x00\x00\x00"):
                        raise NotImplementedError(
                            f"AVI video codec {codec!r}: only MJPG is "
                            "implemented (H.264/VP9 need real decoders)"
                        )
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                if size and start + size <= len(data):
                    frames.append(data[start : start + size])

    walk(12, len(data))
    return frames


def encode_mjpeg_avi(
    jpeg_frames: list[bytes], w: int, h: int, fps: int = 25
) -> bytes:
    """JPEG frame payloads -> minimal valid MJPEG AVI bytes."""
    n = len(jpeg_frames)
    # stream format: BITMAPINFOHEADER with MJPG compression
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1), 0, 0, 0x10, n, 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi_body = b"".join(_chunk(b"00dc", f) for f in jpeg_frames)
    movi = _list(b"movi", movi_body)
    body = hdrl + movi
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    out = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return out


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)
