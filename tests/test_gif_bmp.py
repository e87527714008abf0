"""GIF (io/gif.py) and BMP (io/images.py) codecs: lossless round trips,
foreign decode-only paths via hand-assembled streams (interlace,
transparency, disposal), rejection of malformed payloads, and the
decode_image / frame_sample integration."""

import struct

import numpy as np
import pytest

from geomesa_sql_spark.io.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_frames,
)
from geomesa_sql_spark.io.images import decode_bmp, decode_image, encode_bmp


def _art(h=40, w=56, shift=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [((xx + shift) // 4 * 16) % 256, (yy // 4 * 32) % 256, ((xx + yy) // 8 * 8) % 256],
        axis=-1,
    ).astype(np.uint8)


def test_lzw_roundtrip_growth_and_reset():
    rng = np.random.default_rng(5)
    # 300k random symbols force width growth to 12 bits and dictionary
    # resets (the width-bump convention is asymmetric encoder/decoder)
    idx = rng.integers(0, 16, 300000).astype(np.uint8)
    assert (_lzw_decode(_lzw_encode(idx, 4), 4, len(idx)) == idx).all()
    for nc, mcs in ((2, 2), (256, 8)):
        ii = rng.integers(0, nc, 50000).astype(np.uint8)
        assert (_lzw_decode(_lzw_encode(ii, mcs), mcs, len(ii)) == ii).all()


def test_gif_roundtrip_single_and_animated():
    img = _art()
    enc = encode_gif(img)
    assert (decode_gif(enc) == img).all()
    assert len(enc) < img.nbytes * 0.6  # real compression
    frames = [np.roll(img, i * 3, axis=1) for i in range(4)]
    got = gif_frames(encode_gif(frames))
    assert len(got) == 4
    for a, b in zip(got, frames):
        assert (a == b).all()


def test_gif_256_colors_and_reject_more():
    pal = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img = np.stack([pal, pal[::-1], pal.T], axis=-1)
    assert (decode_gif(encode_gif(img)) == img).all()
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="256"):
        encode_gif(rng.integers(0, 256, (64, 64, 3)).astype(np.uint8))


def test_gif_interlaced_hand_assembled():
    # rows stored in 8/8/4/2 pass order with the interlace flag set:
    # permute the input rows into storage order, flip the flag, and the
    # decoder must hand back the original
    img = _art(h=16, w=8)
    storage_rows = [y for s, p in ((0, 8), (4, 8), (2, 4), (1, 2)) for y in range(s, 16, p)]
    enc = bytearray(encode_gif(img[storage_rows]))
    at = enc.index(b"\x2c")  # image descriptor
    enc[at + 9] |= 0x40  # interlace flag
    assert (decode_gif(bytes(enc)) == img).all()


def _manual_gif(frames_idx, pal, gce=None, disposal=0, transparent=None):
    """Assemble a GIF from index rasters + palette with explicit GCEs."""
    h, w = frames_idx[0].shape
    nbits = max(int(len(pal) - 1).bit_length(), 1)
    table = np.zeros((1 << nbits, 3), np.uint8)
    table[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((nbits - 1) & 7), 0, 0)
    out += table.tobytes()
    for idx in frames_idx:
        flags = (disposal & 7) << 2 | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + struct.pack("<BHB", flags, 0, transparent or 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        mcs = max(nbits, 2)
        out += bytes([mcs])
        lzw = _lzw_encode(idx.reshape(-1).astype(np.uint32), mcs)
        for s in range(0, len(lzw), 255):
            out += bytes([len(lzw[s : s + 255])]) + lzw[s : s + 255]
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_transparency_composites_over_previous_frame():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    f1 = np.zeros((4, 6), np.uint8)  # all red
    f2 = np.full((4, 6), 2, np.uint8)  # transparent index everywhere...
    f2[0, :] = 1  # ...except the top row (green)
    data = _manual_gif([f1, f2], pal, transparent=2)
    frames = gif_frames(data)
    assert (frames[0] == [255, 0, 0]).all()
    assert (frames[1][0] == [0, 255, 0]).all()  # painted row
    assert (frames[1][1:] == [255, 0, 0]).all()  # red shows through


def test_gif_disposal_restore_background():
    pal = np.array([[9, 9, 9], [0, 255, 0]], np.uint8)  # bg index 0
    f1 = np.ones((3, 3), np.uint8)
    f2 = np.zeros((3, 3), np.uint8)
    data = _manual_gif([f1, f2], pal, disposal=2)
    frames = gif_frames(data)
    assert (frames[0] == [0, 255, 0]).all()
    assert (frames[1] == [9, 9, 9]).all()


def test_gif_rejections():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"BM" + b"\x00" * 20)
    enc = bytearray(encode_gif(_art(8, 8)))
    with pytest.raises(ValueError):
        decode_gif(bytes(enc[: len(enc) // 2]))  # truncated LZW/blocks


def test_bmp_roundtrip_and_variants():
    rng = np.random.default_rng(3)
    for shape in ((24, 31), (1, 1), (13, 4)):  # odd widths hit row padding
        img = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()
    # top-down (negative height) variant, hand-flipped
    img = rng.integers(0, 256, (6, 5, 3)).astype(np.uint8)
    enc = bytearray(encode_bmp(img[::-1]))
    struct.pack_into("<i", enc, 22, -6)
    assert (decode_bmp(bytes(enc)) == img[::-1][::-1]).all()
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"GIF89a" + b"\x00" * 60)
    with pytest.raises(NotImplementedError, match="BI_PNG"):
        bad = bytearray(encode_bmp(img))
        struct.pack_into("<I", bad, 30, 5)  # BI_PNG (RLE decodes since r4g)
        decode_bmp(bytes(bad))
    # a 24-bit stream relabeled RLE8 is corrupt, not unsupported
    with pytest.raises(ValueError, match="mismatch"):
        bad = bytearray(encode_bmp(img))
        struct.pack_into("<I", bad, 30, 1)  # BI_RLE8 on bpp=24
        decode_bmp(bytes(bad))


def test_decode_image_dispatch():
    img = _art(12, 10)
    assert (decode_image(encode_gif(img), "gif", 10, 12) == img).all()
    assert (decode_image(encode_bmp(img), "bmp", 10, 12) == img).all()


def test_frame_sample_gif_distributed(spark):
    from geomesa_sql_spark.ops.multimodal import frame_sample

    frames = [np.roll(_art(16, 12), i, axis=1) for i in range(5)]
    gif = encode_gif(frames)
    rows = [
        ("g0", gif, 12, 16, "gif"),
        ("g_corrupt", gif[:30], 12, 16, "gif"),
        ("g_null", None, 12, 16, "gif"),
    ]
    df = spark.createDataFrame(
        rows, "video_id string, bytes binary, w int, h int, fmt string"
    )
    out = frame_sample(df, every_n=2).toPandas()
    good = out[out.video_id == "g0"].sort_values("frame_idx")
    assert list(good.frame_idx) == [0, 2, 4]
    for _, r in good.iterrows():
        px = np.frombuffer(bytes(r["bytes"]), np.uint8).reshape(16, 12, 3)
        assert (px == frames[int(r["frame_idx"])]).all()
    for vid in ("g_corrupt", "g_null"):
        sub = out[out.video_id == vid]
        assert len(sub) == 1 and sub["bytes"].iloc[0] is None


def test_gif_disposal_2_restores_global_background():
    # review r4f: the disposed region was painted from the current
    # frame's LOCAL palette; the bg index refers to the GLOBAL table
    gct = np.array([[1, 2, 3], [200, 200, 200]], np.uint8)  # bg = dark
    lct = np.array([[250, 0, 0], [0, 250, 0]], np.uint8)  # local 0 = red
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 3, 3, 0x80, 0, 0)  # GCT of 2, bg index 0
    out += gct.tobytes()
    for _ in range(2):  # two frames, both with the local palette
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 2 << 2, 0, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 3, 0x80)
        out += lct.tobytes()
        out += b"\x02"
        lzw = _lzw_encode(np.ones(9, np.uint32), 2)
        out += bytes([len(lzw)]) + lzw + b"\x00"
    out += b"\x3b"
    frames = gif_frames(bytes(out))
    assert (frames[0] == [0, 250, 0]).all()  # painted from the LCT
    # after disposal 2 the second frame paints over a GCT-bg canvas,
    # which its own full-screen paint then covers — craft a peek via a
    # partial second frame instead
    out2 = bytearray(b"GIF89a")
    out2 += struct.pack("<HHBBB", 3, 3, 0x80, 0, 0)
    out2 += gct.tobytes()
    # frame 1: full screen, local palette, disposal 2
    out2 += b"\x21\xf9\x04" + struct.pack("<BHB", 2 << 2, 0, 0) + b"\x00"
    out2 += b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 3, 0x80) + lct.tobytes()
    lzw = _lzw_encode(np.ones(9, np.uint32), 2)
    out2 += b"\x02" + bytes([len(lzw)]) + lzw + b"\x00"
    # frame 2: 1x1 at origin, local palette
    out2 += b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0x80) + lct.tobytes()
    lzw = _lzw_encode(np.zeros(1, np.uint32), 2)
    out2 += b"\x02" + bytes([len(lzw)]) + lzw + b"\x00"
    out2 += b"\x3b"
    frames = gif_frames(bytes(out2))
    assert (frames[1][0, 0] == [250, 0, 0]).all()  # the 1x1 paint
    assert (frames[1][1:, :] == [1, 2, 3]).all()  # GLOBAL bg, not LCT red


def test_gif_truncated_gce_raises_valueerror():
    pal = np.array([[0, 0, 0], [9, 9, 9]], np.uint8)
    data = bytearray(_manual_gif([np.zeros((2, 2), np.uint8)], pal, transparent=1))
    at = data.index(b"\x21\xf9")
    # shrink the GCE sub-block to 1 byte with the transparency flag set
    data[at + 2] = 1
    data[at + 4 : at + 7] = b"\x00"  # terminator right after flags
    with pytest.raises(ValueError):
        gif_frames(bytes(data[: at + 5]) + bytes(data[at + 7 :]))


def test_gif_allocation_bombs_rejected():
    """A 20-byte header must not be able to buy a multi-GiB allocation:
    out-of-range LZW min-code-size (observed fuzzed value 47 → 128 TiB
    suffix table) and implausible canvas/frame dimensions all raise
    ValueError before any array is sized."""
    img = np.zeros((2, 2, 3), np.uint8)
    blob = bytearray(encode_gif([img]))
    # screen descriptor dims → 65535 x 65535
    blob[6:10] = struct.pack("<HH", 0xFFFF, 0xFFFF)
    with pytest.raises(ValueError, match="implausible GIF canvas"):
        gif_frames(bytes(blob))

    blob = bytearray(encode_gif([img]))
    at = blob.index(b"\x2c")  # image descriptor
    blob[at + 5 : at + 9] = struct.pack("<HH", 0xFFFF, 0xFFFF)
    with pytest.raises(ValueError, match="implausible GIF frame"):
        gif_frames(bytes(blob))

    blob = bytearray(encode_gif([img]))
    at = blob.index(b"\x2c")
    mcs_at = at + 10  # descriptor (9 bytes, no LCT) + block byte
    assert 1 <= blob[mcs_at] <= 8  # sanity: we found the right byte
    blob[mcs_at] = 47
    with pytest.raises(ValueError, match="min code size"):
        gif_frames(bytes(blob))


def test_gif_total_frame_memory_bounded():
    """A near-cap canvas with many tiny frames must not buy unbounded
    memory through per-frame canvas copies (review r4g): the SUM of
    frame pixels is bounded, not just each allocation."""
    from geomesa_sql_spark.io.gif import _lzw_encode

    pal = np.array([[0, 0, 0], [9, 9, 9]], np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 8192, 8192, 0x80, 0, 0)  # 64 MP, 2-entry GCT
    out += pal.tobytes()
    lzw = _lzw_encode(np.zeros(1, np.uint32), 2)
    frame = b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
    frame += b"\x02" + bytes([len(lzw)]) + lzw + b"\x00"
    out += frame * 16  # 16 x 64 MP composited copies > 256 MP budget
    out += b"\x3b"
    with pytest.raises(ValueError, match="memory budget"):
        gif_frames(bytes(out))


def _bmp_header(w, h, bpp, compression, pal=None, img_size=0):
    hdr_size = 40
    ncol = len(pal) if pal is not None else 0
    offset = 14 + hdr_size + 4 * ncol
    body = struct.pack("<IiiHHIIiiII", hdr_size, w, h, 1, bpp, compression,
                       img_size, 0, 0, ncol, 0)
    if pal is not None:
        bgra = np.zeros((ncol, 4), np.uint8)
        bgra[:, :3] = pal[:, ::-1]
        body += bgra.tobytes()
    return b"BM" + struct.pack("<IHHI", 0, 0, 0, offset) + body


def test_bmp_subbyte_palettes():
    rng = np.random.default_rng(41)
    for bpp in (1, 4):
        ncol = 1 << bpp
        pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
        h, w = 5, 11
        idx = rng.integers(0, ncol, (h, w)).astype(np.uint8)
        stride = ((w * bpp + 31) // 32) * 4
        rows = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up storage
            bits = ((idx[y][:, None] >> np.arange(bpp - 1, -1, -1)) & 1)
            packed = np.packbits(bits.reshape(-1).astype(np.uint8)).tobytes()
            rows += packed + b"\x00" * (stride - len(packed))
        blob = _bmp_header(w, h, bpp, 0, pal) + bytes(rows)
        assert (decode_bmp(blob) == pal[idx]).all(), bpp


def test_bmp_rle8_and_rle4():
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    # RLE8: run of 5xA, absolute [1,2,3], EOL, delta(1,0), run 2xB, EOF
    w, h = 8, 2
    rle8 = bytes([5, 10, 0, 3, 1, 2, 3, 0,  # padded to word (3 -> 4 bytes)
                  0, 0,                      # end of line
                  0, 2, 1, 0,                # delta x+1
                  2, 11,
                  0, 1])
    blob = _bmp_header(w, h, 8, 1, pal, img_size=len(rle8)) + rle8
    got = decode_bmp(blob)
    want_idx = np.zeros((h, w), np.uint8)
    want_idx[1, :5] = 10          # bottom storage row = image row 1
    want_idx[1, 5:8] = [1, 2, 3]
    want_idx[0, 1:3] = 11         # next storage row after EOL + delta
    assert (got == pal[want_idx]).all()
    # RLE4: run of 6 alternating 0x2,0x7 then absolute 3 nibbles
    rle4 = bytes([6, 0x27,
                  0, 3, 0x45, 0x60, 0,       # absolute 4,5,6 (word pad)
                  0, 1])
    blob = _bmp_header(w, 1, 4, 2, pal, img_size=len(rle4)) + rle4
    got = decode_bmp(blob)
    want_idx = np.zeros((1, w), np.uint8)
    want_idx[0, :6] = [2, 7, 2, 7, 2, 7]
    want_idx[0, 6:8] = [4, 5]  # 6 only if w>8; clipped at w=8
    assert (got == pal[want_idx]).all()


def test_bmp_16bit_555_and_bitfields_565():
    rng = np.random.default_rng(7)
    h, w = 3, 5
    r5 = rng.integers(0, 32, (h, w), dtype=np.uint32)
    g5 = rng.integers(0, 32, (h, w), dtype=np.uint32)
    b5 = rng.integers(0, 32, (h, w), dtype=np.uint32)
    v555 = ((r5 << 10) | (g5 << 5) | b5).astype("<u2")
    stride = ((w * 16 + 31) // 32) * 4
    rows = b"".join(
        v555[y].tobytes() + b"\x00" * (stride - w * 2)
        for y in range(h - 1, -1, -1))
    blob = _bmp_header(w, h, 16, 0) + rows
    got = decode_bmp(blob)
    assert (got[..., 0] == (r5 * 255 // 31).astype(np.uint8)).all()
    assert (got[..., 2] == (b5 * 255 // 31).astype(np.uint8)).all()
    # 565 via BI_BITFIELDS masks appended after the header
    g6 = rng.integers(0, 64, (h, w), dtype=np.uint32)
    v565 = ((r5 << 11) | (g6 << 5) | b5).astype("<u2")
    rows = b"".join(
        v565[y].tobytes() + b"\x00" * (stride - w * 2)
        for y in range(h - 1, -1, -1))
    hdr = bytearray(_bmp_header(w, h, 16, 3))
    hdr += struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    # pixel offset moves past the masks
    struct.pack_into("<I", hdr, 10, len(hdr))
    blob = bytes(hdr) + rows
    got = decode_bmp(blob)
    assert (got[..., 1] == (g6 * 255 // 63).astype(np.uint8)).all()


def test_bmp_rejections_widened():
    pal = np.zeros((16, 3), np.uint8)
    # RLE compression/bpp mismatch
    blob = _bmp_header(4, 1, 8, 2, pal) + bytes([0, 1])
    with pytest.raises(ValueError, match="mismatch"):
        decode_bmp(blob)
    # implausible dims
    blob = _bmp_header(70000, 70000, 8, 0, pal)
    with pytest.raises(ValueError, match="implausible"):
        decode_bmp(blob)
    # BI_PNG stays loud
    blob = _bmp_header(4, 1, 8, 5, pal)
    with pytest.raises(NotImplementedError):
        decode_bmp(blob)
