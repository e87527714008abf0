"""ISO BMFF (MP4/MOV) container walk: MJPEG round trips through the
module's own writer, table-driven sample extraction, codec/fragment
honesty, and the Spark frame_sample plumbing."""

import struct

import numpy as np
import pytest

from geomesa_sql_spark.io.jpeg import decode_jpeg, encode_jpeg
from geomesa_sql_spark.io.mp4 import encode_mjpeg_mp4, mp4_frames


def _frame(i: int, w: int = 32, h: int = 24) -> np.ndarray:
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return np.clip(x * 3 + y * 2 + c * 20 + i * 5, 0, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(((a.astype(np.int64) - b.astype(np.int64)) ** 2).mean())
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def test_mjpeg_mp4_roundtrip_and_psnr():
    frames = [_frame(i) for i in range(5)]
    jpegs = [encode_jpeg(f, quality=90) for f in frames]
    mp4 = encode_mjpeg_mp4(jpegs, 32, 24, fps=10)
    got = mp4_frames(mp4)
    assert got == jpegs  # byte-exact sample extraction
    for f, j in zip(frames, got):
        assert psnr(f, decode_jpeg(j)) >= 40.0


def test_mp4_multi_chunk_and_co64():
    """Hand-patched layouts the writer doesn't emit: a two-entry stsc
    (chunks of 2 then 1 samples) and a co64 offset table."""
    jpegs = [encode_jpeg(_frame(i), quality=85) for i in range(5)]
    mp4 = bytearray(encode_mjpeg_mp4(jpegs, 32, 24))
    # original single chunk starts at ftyp+8; compute per-sample offsets
    base = mp4.index(b"mdat") + 4
    offs = [base]
    for j in jpegs[:-1]:
        offs.append(offs[-1] + len(j))
    # chunks: [s0,s1], [s2,s3], [s4] -> stsc entries (1,2,1),(3,1,1)
    old_stsc = struct.pack(">I", 28) + b"stsc" + b"\x00" * 4 + struct.pack(
        ">IIII", 1, 1, max(len(jpegs), 1), 1)
    new_stsc = struct.pack(">I", 40) + b"stsc" + b"\x00" * 4 + struct.pack(
        ">IIIIIII", 2, 1, 2, 1, 3, 1, 1)
    at = mp4.index(old_stsc)
    patched = bytes(mp4[:at]) + new_stsc + bytes(mp4[at + len(old_stsc):])
    # stco must list the three chunk starts; replace with co64
    old_stco = struct.pack(">I", 20) + b"stco" + b"\x00" * 4 + struct.pack(
        ">II", 1, base)
    chunk_starts = [offs[0], offs[2], offs[4]]
    new_co64 = (struct.pack(">I", 16 + 8 * 3) + b"co64" + b"\x00" * 4
                + struct.pack(">I", 3) + struct.pack(">3Q", *chunk_starts))
    at = patched.index(old_stco)
    patched = patched[:at] + new_co64 + patched[at + len(old_stco):]

    def fix_sizes(buf: bytes, delta_stsc: int, delta_stco: int) -> bytes:
        # grow the enclosing stbl/minf/mdia/trak/moov box sizes
        out = bytearray(buf)
        for four in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            at = out.index(four)
            (sz,) = struct.unpack_from(">I", out, at - 4)
            struct.pack_into(">I", out, at - 4, sz + delta_stsc + delta_stco)
        return bytes(out)

    patched = fix_sizes(patched, 40 - 28, 40 - 20)
    assert mp4_frames(patched) == jpegs


def test_mp4_rejections():
    with pytest.raises(ValueError, match="ftyp"):
        mp4_frames(b"\x00" * 32)
    jpegs = [encode_jpeg(_frame(0), quality=85)]
    mp4 = bytearray(encode_mjpeg_mp4(jpegs, 32, 24))
    # foreign codec fourcc in the sample entry: loud raise
    at = mp4.index(b"jpeg", mp4.index(b"stsd"))
    avc = bytes(mp4[:at]) + b"avc1" + bytes(mp4[at + 4:])
    with pytest.raises(NotImplementedError, match="avc1"):
        mp4_frames(avc)
    # truncated mdat: sample runs off the end
    short = bytes(mp4[: mp4.index(b"mdat") + 12])
    with pytest.raises(ValueError):
        mp4_frames(short)
    # fragmented marker: loud
    frag = bytes(mp4) + struct.pack(">I", 8) + b"moof"
    with pytest.raises(NotImplementedError, match="moof"):
        mp4_frames(frag)
    # no video track: hdlr patched to soun
    soun = bytearray(mp4)
    at = soun.index(b"vide", soun.index(b"hdlr"))
    soun[at : at + 4] = b"soun"
    with pytest.raises(ValueError, match="no video track"):
        mp4_frames(bytes(soun))


def test_frame_sample_mp4_distributed(spark):
    from geomesa_sql_spark.ops.multimodal import frame_sample

    frames = [_frame(i) for i in range(6)]
    mp4 = encode_mjpeg_mp4([encode_jpeg(f, quality=90) for f in frames], 32, 24)
    rows = [
        ("v0", mp4, 32, 24, "mp4"),
        ("v_corrupt", mp4[:50], 32, 24, "mp4"),
        ("v_null", None, 32, 24, "mov"),
    ]
    df = spark.createDataFrame(
        rows, "video_id string, bytes binary, w int, h int, fmt string"
    )
    out = frame_sample(df, every_n=2).toPandas()
    good = out[out.video_id == "v0"].sort_values("frame_idx")
    assert list(good.frame_idx) == [0, 2, 4]
    for _, r in good.iterrows():
        px = np.frombuffer(bytes(r["bytes"]), dtype=np.uint8).reshape(
            int(r["h"]), int(r["w"]), 3)
        assert psnr(_frame(int(r["frame_idx"])), px) >= 40.0
    for vid in ("v_corrupt", "v_null"):
        sub = out[out.video_id == vid]
        assert len(sub) == 1 and sub["bytes"].iloc[0] is None
    # an H.264 mp4 keeps raising loudly through the Spark plumbing
    avc = bytearray(mp4)
    at = avc.index(b"jpeg", avc.index(b"stsd"))
    avc[at : at + 4] = b"avc1"
    df2 = spark.createDataFrame(
        [("v1", bytes(avc), 32, 24, "mp4")],
        "video_id string, bytes binary, w int, h int, fmt string",
    )
    with pytest.raises(Exception, match="avc1"):
        frame_sample(df2).collect()
