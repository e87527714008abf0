"""From-scratch WebP lossless (VP8L) codec (io/webp.py).

The encoder is validated by exact decode round trips (lossless format —
bit equality, not PSNR). The decoder's foreign-file surface — color
indexing with pixel bundling, the color transform, color cache, 2D LZ77
distance codes, meta-Huffman group switching, the max_symbol shortcut —
is exercised with streams hand-assembled from the module's own
primitives, since the public encoder never emits them.
"""

import struct

import numpy as np
import pytest

from geomesa_sql_spark.io.webp import (
    BitReader,
    BitWriter,
    _DIST_MAP,
    _DIST_TO_CODE,
    _NUM_DISTANCE_CODES,
    _NUM_LENGTH_CODES,
    _HASH_MUL,
    _prefix_decode,
    _prefix_encode,
    _write_code,
    decode_webp,
    encode_webp,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# round trips (encoder-reachable surface)


@pytest.mark.parametrize("subtract_green", [False, True])
@pytest.mark.parametrize("predictor", [False, True])
def test_roundtrip_exact(subtract_green, predictor):
    rng = np.random.default_rng(11)
    for shape in [(13, 17), (1, 1), (64, 1), (1, 64), (40, 40)]:
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        out = decode_webp(
            encode_webp(img, subtract_green=subtract_green, predictor=predictor)
        )
        assert out.dtype == np.uint8 and (out == img).all()


def test_roundtrip_flat_and_gradient_compress():
    flat = np.full((32, 32, 3), 200, dtype=np.uint8)
    data = encode_webp(flat)
    assert (decode_webp(data) == flat).all()
    assert len(data) < flat.nbytes // 10  # runs + entropy coding bite
    grad = _gradient(64, 64)
    data = encode_webp(grad, predictor=True)
    assert (decode_webp(data) == grad).all()
    # T-predictor turns the linear gradient into constant residuals,
    # which the distance-1 runs then collapse
    assert len(data) < grad.nbytes // 8


def test_roundtrip_photo_like_and_palette_like():
    rng = np.random.default_rng(5)
    photo = np.clip(
        np.cumsum(rng.normal(0, 3, (48, 48, 3)), axis=1) + 128, 0, 255
    ).astype(np.uint8)
    assert (decode_webp(encode_webp(photo)) == photo).all()
    # few-color image (our encoder doesn't emit palettes, but the
    # entropy coder should still collapse it)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    img = pal[rng.integers(0, 3, (30, 30))]
    data = encode_webp(img)
    assert (decode_webp(data) == img).all()
    assert len(data) < img.nbytes // 3


def test_prefix_code_roundtrip():
    for v in list(range(1, 50)) + [63, 64, 65, 1000, 2048, 4095, 4096]:
        code, extra_val, extra_bits = _prefix_encode(v)
        assert 0 <= code < 24
        bw = BitWriter()
        bw.write(extra_val, extra_bits)
        br = BitReader(bw.getvalue() or b"\x00")
        assert _prefix_decode(br, code) == v


def test_distance_map_is_spec_table():
    # RFC 9649 distance-map head: order by dx²+dy², |dx|, sign
    assert _DIST_MAP[:14] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
    ]
    assert _DIST_MAP[34:40] == [(0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)]
    assert len(set(_DIST_MAP)) == 120
    assert _DIST_MAP[-1] == (8, 7)


# ---------------------------------------------------------------------------
# hand-assembled foreign streams


def _vp8l_container(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw: BitWriter, w: int, h: int) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


@pytest.mark.parametrize("palette_size,xbits", [(2, 3), (4, 2), (16, 1), (64, 0)])
def test_color_indexing_with_bundling(palette_size, xbits):
    rng = np.random.default_rng(palette_size)
    w, h = 11, 5  # 11 forces a partial final packed byte
    palette = rng.integers(0, 256, (palette_size, 3), dtype=np.uint8)
    idx = rng.integers(0, palette_size, (h, w))

    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(3, 2)  # color indexing
    bw.write(palette_size - 1, 8)
    # palette sub-image: component-wise delta-coded
    pal_px = []
    prev = np.zeros(4, dtype=np.int32)
    for i in range(palette_size):
        cur = np.array([255, *palette[i]], dtype=np.int32)
        d = (cur - prev) & 0xFF
        pal_px.append(tuple(int(v) for v in d))
        prev = cur
    bw.write(0, 1)  # palette stream: no color cache
    _write_argb_literals_body(bw, pal_px)
    bw.write(0, 1)  # no more transforms
    # main image: packed indices in green
    per = 1 << xbits
    bits = 8 >> xbits
    packed_w = (w + per - 1) // per
    main_px = []
    for y in range(h):
        for bx in range(packed_w):
            gval = 0
            for k in range(per):
                x = bx * per + k
                if x < w:
                    gval |= int(idx[y, x]) << (k * bits)
            main_px.append((255, 0, gval, 0))
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-Huffman
    _write_argb_literals_body(bw, main_px)

    out = decode_webp(_vp8l_container(bw.getvalue()))
    assert (out == palette[idx]).all()


def _write_argb_literals_body(bw: BitWriter, px) -> None:
    """5 prefix codes + literal pixels (caller wrote the cache/meta bits)."""
    gf = [0] * (256 + _NUM_LENGTH_CODES)
    rf, bf, af = [0] * 256, [0] * 256, [0] * 256
    for a, r, g, b in px:
        gf[g] += 1
        rf[r] += 1
        bf[b] += 1
        af[a] += 1
    gc = _write_code(bw, gf, 256 + _NUM_LENGTH_CODES)
    rc = _write_code(bw, rf, 256)
    bc = _write_code(bw, bf, 256)
    ac = _write_code(bw, af, 256)
    _write_code(bw, [1] + [0] * (_NUM_DISTANCE_CODES - 1), _NUM_DISTANCE_CODES)
    for a, r, g, b in px:
        for codes, sym in ((gc, g), (rc, r), (bc, b), (ac, a)):
            c, l = codes[sym]
            bw.write_code(c, l)


def _ct_delta_int(t: int, c: int) -> int:
    t8 = t - 256 if t >= 128 else t
    c8 = c - 256 if c >= 128 else c
    return (t8 * c8) >> 5


def test_color_transform_inverse():
    rng = np.random.default_rng(9)
    w, h = 9, 6
    size_bits = 2  # 4x4 blocks -> 3x2 block grid
    bw_blocks = (w + 3) // 4
    bh_blocks = (h + 3) // 4
    cte = rng.integers(0, 256, (bw_blocks * bh_blocks, 3), dtype=np.int32)
    # cte columns: green_to_red, green_to_blue, red_to_blue
    target = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    # forward transform (what an encoder would store)
    stored = []
    for y in range(h):
        for x in range(w):
            blk = (y >> size_bits) * bw_blocks + (x >> size_bits)
            g2r, g2b, r2b = (int(v) for v in cte[blk])
            R, G, B = (int(v) for v in target[y, x])
            r = (R - _ct_delta_int(g2r, G)) & 0xFF
            b = (B - _ct_delta_int(g2b, G) - _ct_delta_int(r2b, R)) & 0xFF
            stored.append((255, r, G, b))

    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # color transform
    bw.write(size_bits - 2, 3)
    # sub-image pixels: blue=g2r, green=g2b, red=r2b
    sub_px = [(255, int(r2b), int(g2b), int(g2r)) for g2r, g2b, r2b in cte]
    bw.write(0, 1)  # sub stream: no color cache
    _write_argb_literals_body(bw, sub_px)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-Huffman
    _write_argb_literals_body(bw, stored)

    out = decode_webp(_vp8l_container(bw.getvalue()))
    assert (out == target).all()


def test_color_cache_and_lz77_2d_distance():
    w, h = 6, 3
    cache_bits = 4
    A = (255, 10, 20, 30)
    B = (255, 200, 100, 50)
    green_size = 256 + _NUM_LENGTH_CODES + (1 << cache_bits)
    argb_a = (A[0] << 24) | (A[1] << 16) | (A[2] << 8) | A[3]
    cache_idx = (_HASH_MUL * argb_a & 0xFFFFFFFF) >> (32 - cache_bits)

    # row 0: A B A(cache) B(lz dist 2) B B  (run via plane code (2,0))
    # rows 1-2: copy row 0 twice via plane code (0,1) dist=w, length=2w
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta-Huffman

    cache_sym = 256 + _NUM_LENGTH_CODES + cache_idx
    len3_code, len3_ev, len3_eb = _prefix_encode(3)
    len2w_code, len2w_ev, len2w_eb = _prefix_encode(2 * w)
    gf = [0] * green_size
    for s in (A[2], B[2], cache_sym):
        gf[s] += 1
    gf[256 + len3_code] += 1
    gf[256 + len2w_code] += 1
    rf, bf, af = [0] * 256, [0] * 256, [0] * 256
    for px in (A, B):
        af[px[0]] += 1
        rf[px[1]] += 1
        bf[px[3]] += 1
    dist2_code = _DIST_TO_CODE[(2, 0)]
    distw_code = _DIST_TO_CODE[(0, 1)]
    d2c, d2ev, d2eb = _prefix_encode(dist2_code)
    dwc, dwev, dweb = _prefix_encode(distw_code)
    df = [0] * _NUM_DISTANCE_CODES
    df[d2c] += 1
    df[dwc] += 1

    gc = _write_code(bw, gf, green_size)
    rc = _write_code(bw, rf, 256)
    bc = _write_code(bw, bf, 256)
    ac = _write_code(bw, af, 256)
    dc = _write_code(bw, df, _NUM_DISTANCE_CODES)

    def lit(px):
        for codes, sym in ((gc, px[2]), (rc, px[1]), (bc, px[3]), (ac, px[0])):
            c, l = codes[sym]
            bw.write_code(c, l)

    lit(A)
    lit(B)
    c, l = gc[cache_sym]  # A again, via the cache
    bw.write_code(c, l)
    # copy length 3 at 2D distance (2, 0) -> linear dist 2 -> B A B
    c, l = gc[256 + len3_code]
    bw.write_code(c, l)
    bw.write(len3_ev, len3_eb)
    c, l = dc[d2c]
    bw.write_code(c, l)
    bw.write(d2ev, d2eb)
    # copy 2 rows at 2D distance (0, 1) -> linear dist w
    c, l = gc[256 + len2w_code]
    bw.write_code(c, l)
    bw.write(len2w_ev, len2w_eb)
    c, l = dc[dwc]
    bw.write_code(c, l)
    bw.write(dwev, dweb)

    out = decode_webp(_vp8l_container(bw.getvalue()))
    row = np.array([A[1:], B[1:], A[1:], B[1:], A[1:], B[1:]], dtype=np.uint8)
    # positions 3..5: copy from dist 2: pos3=pos1(B), pos4=pos2(A), pos5=pos3(B)
    row[3], row[4], row[5] = (B[1:], A[1:], B[1:])
    expect = np.stack([row, row, row])
    assert (out == expect).all()


def test_meta_huffman_group_switch():
    # 8x1 image, hbits=2 (4px blocks): entropy image 2x1 selects group 0
    # then group 1; each group's codes are single-symbol (zero bits), so
    # the pixel stream is empty — the groups alone determine the output.
    w, h = 8, 1
    A = (255, 1, 2, 3)
    B = (255, 9, 8, 7)
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta-Huffman present
    bw.write(0, 3)  # hbits = 2
    # entropy sub-image (2x1): meta index = (red<<8)|green -> 0 and 1
    bw.write(0, 1)  # sub stream: no color cache
    _write_argb_literals_body(bw, [(255, 0, 0, 0), (255, 0, 1, 0)])
    for px in (A, B):  # two groups, all codes single-symbol
        gf = [0] * (256 + _NUM_LENGTH_CODES)
        gf[px[2]] = 1
        _write_code(bw, gf, 256 + _NUM_LENGTH_CODES)
        for ch in (px[1], px[3], px[0]):
            f = [0] * 256
            f[ch] = 1
            _write_code(bw, f, 256)
        _write_code(bw, [1] + [0] * (_NUM_DISTANCE_CODES - 1), _NUM_DISTANCE_CODES)

    out = decode_webp(_vp8l_container(bw.getvalue()))
    expect = np.array([[A[1:]] * 4 + [B[1:]] * 4], dtype=np.uint8)
    assert (out == expect).all()


def test_max_symbol_shortcut():
    # normal code written with the max_symbol path: symbols {0,1} length 1,
    # everything after cut off by max_symbol=2
    w, h = 4, 1
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # green code, normal form, via max_symbol
    bw.write(0, 1)  # not simple
    # code-length code: only symbol 1 used (twice) -> trivial zero-bit
    # order = [17, 18, 0, 1, ...]; index of symbol 1 is 3 -> num_codes 4
    bw.write(0, 4)  # num_codes = 4
    for v in (0, 0, 0, 1):  # lengths for 17, 18, 0, 1
        bw.write(v, 3)
    bw.write(1, 1)  # use max_symbol
    bw.write(0, 3)  # length_nbits = 2
    bw.write(0, 2)  # max_symbol = 2
    # two zero-bit code-length symbols -> lengths[0]=1, lengths[1]=1
    for f in ([1] * 1 + [0] * 255, [1] + [0] * 255, [0, 1] + [0] * 254):
        _write_code(bw, f, 256)  # red, blue, alpha(=1 here for variety)
    _write_code(bw, [1] + [0] * (_NUM_DISTANCE_CODES - 1), _NUM_DISTANCE_CODES)
    # pixels: greens 0,1,1,0 -> one bit each (canonical: 0->0, 1->1)
    for g in (0, 1, 1, 0):
        bw.write_code(g, 1)
        # red/blue zero bits (single-symbol), alpha zero bits
    out = decode_webp(_vp8l_container(bw.getvalue()))
    assert (out[0, :, 1] == np.array([0, 1, 1, 0])).all()  # green channel
    assert (out[0, :, 0] == 0).all() and (out[0, :, 2] == 0).all()


# ---------------------------------------------------------------------------
# error paths


def test_rejects_bad_containers():
    img = _gradient(4, 4)
    good = encode_webp(img)
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"nope" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(good[:-3] + b"")
    with pytest.raises(ValueError, match="VP8L chunk"):
        decode_webp(b"RIFF\x04\x00\x00\x00WEBP")
    # lossy VP8 raises loudly, not silently
    lossy = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(lossy)


def test_rejects_bad_vp8l_payloads():
    bw = BitWriter()
    _header(bw, 4, 1)
    payload = bytearray(bw.getvalue())
    payload[0] = 0x2E
    with pytest.raises(ValueError, match="signature"):
        decode_webp(_vp8l_container(bytes(payload)))
    # bad version
    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(3, 14)
    bw.write(0, 14)
    bw.write(0, 1)
    bw.write(5, 3)
    with pytest.raises(ValueError, match="version"):
        decode_webp(_vp8l_container(bw.getvalue()))
    # LZ77 reference before start of image
    bw = BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    gf = [0] * (256 + _NUM_LENGTH_CODES)
    gf[5] = 1
    gf[256] = 1  # length code 0 -> length 1
    gc = _write_code(bw, gf, 256 + _NUM_LENGTH_CODES)
    for _ in range(3):
        _write_code(bw, [1] + [0] * 255, 256)
    dist_code_121 = 30  # prefix value large -> linear distance > idx
    df = [0] * _NUM_DISTANCE_CODES
    df[dist_code_121] = 1
    dc = _write_code(bw, df, _NUM_DISTANCE_CODES)
    c, l = gc[5]
    bw.write_code(c, l)
    c, l = gc[256]
    bw.write_code(c, l)
    c, l = dc[dist_code_121]
    bw.write_code(c, l)
    bw.write(0, (dist_code_121 - 2) >> 1)
    with pytest.raises(ValueError, match="out of bounds"):
        decode_webp(_vp8l_container(bw.getvalue()))


def test_dimension_guard():
    with pytest.raises(ValueError, match="16384"):
        encode_webp(np.zeros((1, 20000, 3), dtype=np.uint8))


# ---------------------------------------------------------------------------
# engine integration


def test_decode_image_dispatch():
    from geomesa_sql_spark.io.images import decode_image

    img = _gradient(8, 12)
    out = decode_image(encode_webp(img), "webp", 12, 8)
    assert (out == img).all()
    # tiff decodes for real now; a genuinely unknown format stays loud
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00" * 10, "exr", 1, 1)
    with pytest.raises(ValueError):
        decode_image(b"\x00" * 10, "tiff", 1, 1)


def test_transcode_to_webp_distributed(spark):
    from geomesa_sql_spark.io.images import encode_png
    from geomesa_sql_spark.ops.multimodal import transcode_images

    rng = np.random.default_rng(21)
    rows = []
    for i in range(12):
        px = rng.integers(0, 256, (10 + i, 14, 3), dtype=np.uint8)
        rows.append((f"img{i:03d}", encode_png(px), 14, 10 + i, "png"))
    rows.append(("img_null", None, 5, 5, "png"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, w int, h int, fmt string")
    out = transcode_images(df, to="webp").toPandas().set_index("image_id")
    assert set(out.index) == {r[0] for r in rows}
    assert out.loc["img_null", "bytes"] is None
    for iid, blob, w, h, fmt in rows[:-1]:
        got = decode_webp(bytes(out.loc[iid, "bytes"]))
        from geomesa_sql_spark.io.images import decode_png

        assert (got == decode_png(blob)).all()
        assert out.loc[iid, "fmt"] == "webp"
        assert out.loc[iid, "psnr_db"] == float("inf")


# ---------------------------------------------------------------------------
# review-wave regressions


def test_predictor_mode13_truncates_toward_zero():
    """ClampAddSubtractHalf uses C truncation, not Python floor division:
    avg(L,T) - TL negative and odd must round toward zero (off-by-one
    pixel corruption on real libwebp files otherwise)."""
    w, h = 2, 2
    # decoded targets chosen so (1,1)'s red channel hits avg=10, TL=13
    target = np.array(
        [[[13, 0, 0], [11, 0, 0]], [[10, 0, 0], [50, 60, 70]]], dtype=np.uint8
    )

    def clamp(v):
        return max(0, min(255, v))

    # forward residuals under C semantics (the file a spec encoder writes)
    res = np.zeros((h, w, 4), dtype=np.int64)  # a, r, g, b
    px = np.concatenate([np.full((h, w, 1), 255), target], axis=2).astype(np.int64)
    res[0, 0] = (px[0, 0] - np.array([255, 0, 0, 0])) & 0xFF  # black pred
    res[0, 1] = (px[0, 1] - px[0, 0]) & 0xFF  # forced L
    res[1, 0] = (px[1, 0] - px[0, 0]) & 0xFF  # forced T
    L, T, TL = px[1, 0], px[0, 1], px[0, 0]
    pred = []
    for c in range(4):
        avg = (int(L[c]) + int(T[c])) >> 1
        d = avg - int(TL[c])
        half = d // 2 if d >= 0 else -((-d) // 2)  # trunc toward zero
        pred.append(clamp(avg + half))
    res[1, 1] = (px[1, 1] - np.array(pred)) & 0xFF

    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)  # predictor transform
    bw.write(0, 3)  # size_bits = 2 -> one 4x4 block
    bw.write(0, 1)  # mode sub-image: no color cache
    _write_argb_literals_body(bw, [(255, 0, 13, 0)])  # mode 13 in green
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-Huffman
    _write_argb_literals_body(
        bw, [tuple(int(v) for v in res[y, x]) for y in range(h) for x in range(w)]
    )
    out = decode_webp(_vp8l_container(bw.getvalue()))
    assert (out == target).all()


def test_oversubscribed_code_rejected():
    """A corrupt stream declaring 280 length-1 symbols must raise, not
    silently alias LUT slots into garbage pixels."""
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-Huffman
    bw.write(0, 1)  # green code: not simple
    bw.write(0, 4)  # num_codes = 4 -> order [17, 18, 0, 1]
    for v in (0, 0, 0, 1):
        bw.write(v, 3)  # only code-length symbol 1 used -> trivial 0-bit
    bw.write(0, 1)  # no max_symbol: all 280 entries read as length 1
    with pytest.raises(ValueError, match="over-subscribed"):
        decode_webp(_vp8l_container(bw.getvalue()))


def test_bitwriter_field_width_guard():
    bw = BitWriter()
    with pytest.raises(ValueError, match="16 bits"):
        bw.write(0, 17)


def test_transcode_survives_unencodable_dimensions(spark):
    """A 20000-px-wide image decodes fine but exceeds VP8L's 16384
    dimension cap — it must become a NULL row, not kill the task."""
    from geomesa_sql_spark.io.images import encode_raw
    from geomesa_sql_spark.ops.multimodal import transcode_images

    wide = np.zeros((2, 20000, 3), dtype=np.uint8)
    ok = np.full((4, 4, 3), 7, dtype=np.uint8)
    df = spark.createDataFrame(
        [
            ("wide", encode_raw(wide), 20000, 2, "raw"),
            ("ok", encode_raw(ok), 4, 4, "raw"),
        ],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    out = transcode_images(df, to="webp").toPandas().set_index("image_id")
    assert out.loc["wide", "bytes"] is None
    assert (decode_webp(bytes(out.loc["ok", "bytes"])) == ok).all()
