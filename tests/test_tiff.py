"""Baseline TIFF codec: round trips through the module's own encoder
(none/PackBits/LZW/deflate x predictor), hand-assembled foreign layouts
(big-endian, grayscale both polarities, palette ColorMap, sub-byte and
16-bit depths), and rejection honesty."""

import struct
import zlib

import numpy as np
import pytest

from geomesa_sql_spark.io.images import decode_image
from geomesa_sql_spark.io.tiff import (
    _packbits_decode,
    _packbits_encode,
    _tiff_lzw_decode,
    _tiff_lzw_encode,
    decode_tiff,
    encode_tiff,
)


def test_packbits_known_vectors():
    # the TIFF 6.0 spec's own PackBits example
    src = bytes([0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA, 0xAA,
                 0xAA, 0x80, 0x00, 0x2A, 0x22, 0xAA, 0xAA, 0xAA, 0xAA,
                 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA])
    enc = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03,
                 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    assert _packbits_decode(enc, len(src)) == src
    assert _packbits_decode(_packbits_encode(src), len(src)) == src


def test_primitive_roundtrips_with_width_growth():
    rng = np.random.default_rng(9)
    long = rng.integers(0, 256, 100_000).astype(np.uint8).tobytes()
    assert _tiff_lzw_decode(_tiff_lzw_encode(long), len(long)) == long
    runs = rng.integers(0, 3, 20_000).astype(np.uint8).tobytes()
    assert _tiff_lzw_decode(_tiff_lzw_encode(runs), len(runs)) == runs
    assert _packbits_decode(_packbits_encode(runs), len(runs)) == runs


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw", "deflate"])
@pytest.mark.parametrize("predictor", [False, True])
def test_rgb_roundtrip(comp, predictor):
    rng = np.random.default_rng(hash((comp, predictor)) % 1000)
    for shape in ((1, 1), (7, 13), (40, 23)):
        px = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        blob = encode_tiff(px, comp, predictor, rows_per_strip=6)
        assert (decode_tiff(blob) == px).all()
        assert (decode_image(blob, "tiff", shape[1], shape[0]) == px).all()


def _hand_tiff(bo, tags_vals, pixel_payloads):
    """Minimal writer for foreign layouts: bo '<' or '>', tags_vals =
    [(tag, type, [vals])], strips appended and offsets patched."""
    out = bytearray((b"II*\x00" if bo == "<" else b"MM\x00*") + b"\x00" * 4)
    entries = sorted(tags_vals)
    struct.pack_into(bo + "I", out, 4, len(out))
    out += struct.pack(bo + "H", len(entries))
    extra = bytearray()
    extra_base = len(out) + 12 * len(entries) + 4
    fixups = {}
    for tag, typ, vals in entries:
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        size = {1: 1, 3: 2, 4: 4}[typ] * len(vals)
        packed = struct.pack(bo + str(len(vals)) + fmt, *vals)
        if size <= 4:
            if tag == 273:
                fixups[273] = (len(out) + 8, typ, False)
            vfield = packed + b"\x00" * (4 - size)
        else:
            if tag == 273:
                fixups[273] = (extra_base + len(extra), typ, True)
            vfield = struct.pack(bo + "I", extra_base + len(extra))
            extra += packed
        out += struct.pack(bo + "HHI", tag, typ, len(vals)) + vfield
    out += b"\x00" * 4
    out += extra
    offs = []
    for p in pixel_payloads:
        offs.append(len(out))
        out += p
    at, typ, _ = fixups[273]
    fmt = {3: "H", 4: "I"}[typ]
    for k, o in enumerate(offs):
        struct.pack_into(bo + fmt, out, at + {3: 2, 4: 4}[typ] * k, o)
    return bytes(out)


@pytest.mark.parametrize("bo", ["<", ">"])
def test_grayscale_both_polarities_and_orders(bo):
    rng = np.random.default_rng(4)
    h, w = 6, 9
    g = rng.integers(0, 256, (h, w)).astype(np.uint8)
    for photo in (0, 1):
        blob = _hand_tiff(bo, [
            (256, 4, [w]), (257, 4, [h]), (258, 3, [8]), (259, 3, [1]),
            (262, 3, [photo]), (273, 4, [0]), (277, 3, [1]),
            (278, 4, [h]), (279, 4, [h * w]),
        ], [g.tobytes()])
        want = (255 - g) if photo == 0 else g
        assert (decode_tiff(blob) == np.repeat(want[..., None], 3, 2)).all()


def test_palette_and_subbyte_and_16bit():
    rng = np.random.default_rng(6)
    h, w = 5, 7
    # 4-bit palette with a 16-bit ColorMap
    idx = rng.integers(0, 16, (h, w)).astype(np.uint8)
    row_bytes = (w * 4 + 7) // 8
    rows = b"".join(
        np.packbits(((idx[y][:, None] >> np.arange(3, -1, -1)) & 1)
                    .reshape(-1).astype(np.uint8)).tobytes()[:row_bytes]
        for y in range(h))
    cmap = rng.integers(0, 65536, 3 * 16).tolist()
    blob = _hand_tiff("<", [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [4]), (259, 3, [1]),
        (262, 3, [3]), (273, 4, [0]), (277, 3, [1]), (278, 4, [h]),
        (279, 4, [len(rows)]), (320, 3, cmap),
    ], [rows])
    lut = (np.array(cmap, dtype=np.uint32).reshape(3, 16).T >> 8).astype(np.uint8)
    assert (decode_tiff(blob) == lut[idx]).all()
    # 16-bit grayscale big-endian: high byte survives
    g16 = rng.integers(0, 65536, (h, w)).astype(np.uint16)
    blob = _hand_tiff(">", [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [16]), (259, 3, [1]),
        (262, 3, [1]), (273, 4, [0]), (277, 3, [1]), (278, 4, [h]),
        (279, 4, [h * w * 2]),
    ], [g16.astype(">u2").tobytes()])
    want = (g16 >> 8).astype(np.uint8)
    assert (decode_tiff(blob) == np.repeat(want[..., None], 3, 2)).all()


def test_rgba_extra_sample_dropped_and_multi_strip_lzw():
    rng = np.random.default_rng(11)
    h, w = 11, 6
    px = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    rows = px.reshape(h, -1)
    strips, counts = [], []
    for y0 in range(0, h, 3):
        chunk = _tiff_lzw_encode(rows[y0:y0 + 3].tobytes())
        strips.append(chunk)
        counts.append(len(chunk))
    blob = _hand_tiff("<", [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8, 8]),
        (259, 3, [5]), (262, 3, [2]), (273, 4, [0] * len(strips)),
        (277, 3, [4]), (278, 4, [3]), (279, 4, counts),
    ], strips)
    assert (decode_tiff(blob) == px[..., :3]).all()


def test_tiff_rejections():
    with pytest.raises(ValueError, match="II\\*"):
        decode_tiff(b"NOTATIFF" * 4)
    px = np.zeros((4, 4, 3), np.uint8)
    good = bytearray(encode_tiff(px))
    # TileWidth declared but no tile offset/count tables: malformed
    blob = _hand_tiff("<", [
        (256, 4, [4]), (257, 4, [4]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [1]), (273, 4, [0]), (277, 3, [1]), (278, 4, [4]),
        (279, 4, [16]), (322, 4, [16]),
    ], [bytes(16)])
    with pytest.raises(ValueError, match="tiled TIFF missing"):
        decode_tiff(blob)
    # implausible dims
    blob = _hand_tiff("<", [
        (256, 4, [100000]), (257, 4, [100000]), (258, 3, [8]),
        (259, 3, [1]), (262, 3, [1]), (273, 4, [0]), (277, 3, [1]),
        (278, 4, [4]), (279, 4, [16]),
    ], [bytes(16)])
    with pytest.raises(ValueError, match="implausible"):
        decode_tiff(blob)
    # truncated strip
    with pytest.raises(ValueError):
        decode_tiff(bytes(good[:40]))


def test_tiled_layouts_roundtrip():
    """Tiled organization (the layout real GeoTIFFs ship in): every
    compression, edge tiles cropped, uint8/uint16/float32 dtypes."""
    from geomesa_sql_spark.io.tiff import decode_tiff_raster, encode_geotiff

    rng = np.random.default_rng(21)
    for comp in ("none", "packbits", "lzw", "deflate"):
        g = rng.integers(0, 256, (37, 53)).astype(np.uint8)
        blob = encode_geotiff(g, pixel_scale=(1, 1), tiepoint_xy=(0, 0),
                              tile=16, compression=comp)
        s, info = decode_tiff_raster(blob)
        assert info["tiled"] and (s[..., 0] == g).all(), comp
        # the RGB surface stitches the same tiles
        assert (decode_tiff(blob)[..., 0] == g).all()
    u16 = rng.integers(0, 65536, (18, 31)).astype(np.uint16)
    blob = encode_geotiff(u16, pixel_scale=(1, 1), tiepoint_xy=(0, 0),
                          tile=16, compression="lzw", predictor=True)
    s, _ = decode_tiff_raster(blob)
    assert s.dtype == np.uint16 and (s[..., 0] == u16).all()
    f32 = rng.normal(size=(40, 16)).astype(np.float32)
    blob = encode_geotiff(f32, pixel_scale=(1, 1), tiepoint_xy=(0, 0),
                          tile=16, compression="deflate")
    s, _ = decode_tiff_raster(blob)
    assert s.dtype == np.float32 and (s[..., 0] == f32).all()
    # float pixels are data, not pictures: the RGB surface stays loud
    with pytest.raises(NotImplementedError, match="decode_tiff_raster"):
        decode_tiff(blob)


def test_planar_configuration_2():
    """Separate component planes: strips ordered plane-major."""
    rng = np.random.default_rng(22)
    h, w, rps = 11, 7, 4
    px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    strips, counts = [], []
    for p in range(3):
        for y0 in range(0, h, rps):
            chunk = px[y0:y0 + rps, :, p].tobytes()
            strips.append(chunk)
            counts.append(len(chunk))
    blob = _hand_tiff("<", [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]), (259, 3, [1]),
        (262, 3, [2]), (273, 4, [0] * len(strips)), (277, 3, [3]),
        (278, 4, [rps]), (279, 4, counts), (284, 3, [2]),
    ], strips)
    assert (decode_tiff(blob) == px).all()


def _split_jpeg_tables(jpg: bytes) -> tuple[bytes, bytes]:
    """(tables stream SOI..EOI, abbreviated image stream) from a full
    JFIF file — marker surgery moving DQT/DHT into JPEGTables."""
    tables, body = bytearray(b"\xff\xd8"), bytearray(b"\xff\xd8")
    i = 2
    while i < len(jpg) - 1:
        assert jpg[i] == 0xFF
        m = jpg[i + 1]
        ln = int.from_bytes(jpg[i + 2:i + 4], "big")
        seg = jpg[i:i + 2 + ln]
        if m in (0xDB, 0xC4):  # DQT / DHT
            tables += seg
        else:
            body += seg
        if m == 0xDA:  # SOS: rest is entropy-coded data + EOI
            body += jpg[i + 2 + ln:]
            break
        i += 2 + ln
    tables += b"\xff\xd9"
    return bytes(tables), bytes(body)


def test_jpeg_in_tiff_strips_and_tables():
    """Compression 7: abbreviated per-strip JPEG streams with shared
    tables in the JPEGTables tag, decoded via io/jpeg.py."""
    from geomesa_sql_spark.io.jpeg import encode_jpeg
    from geomesa_sql_spark.io.tiff import _write_ifd

    h, w, rps = 32, 48, 16
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    px = (x * 2 + y * 2 + c * 20).astype(np.uint8)  # smooth, no wraps
    strips, tables_blob = [], None
    for y0 in range(0, h, rps):
        jpg = encode_jpeg(px[y0:y0 + rps], quality=95)
        tables, body = _split_jpeg_tables(jpg)
        tables_blob = tables  # identical across strips by construction
        strips.append(body)
    blob = _write_ifd([
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]), (259, 3, [7]),
        (262, 3, [6]), (273, 4, [0] * len(strips)), (277, 3, [3]),
        (278, 4, [rps]), (279, 4, [len(s) for s in strips]),
        (347, 7, tables_blob),
    ], strips, 273)
    got = decode_tiff(blob).astype(np.int64)
    err = np.abs(got - px.astype(np.int64))
    mse = float((err ** 2).mean())
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 40.0, psnr
    # self-contained segments (no JPEGTables tag) decode too
    full = [encode_jpeg(px[y0:y0 + rps], quality=95)
            for y0 in range(0, h, rps)]
    blob = _write_ifd([
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]), (259, 3, [7]),
        (262, 3, [6]), (273, 4, [0] * len(full)), (277, 3, [3]),
        (278, 4, [rps]), (279, 4, [len(s) for s in full]),
    ], full, 273)
    got2 = decode_tiff(blob)
    assert (got2 == got).all()


def test_geotiff_tags_roundtrip_and_lonlat():
    from geomesa_sql_spark.io.tiff import (
        encode_geotiff, geotiff_bbox_lonlat, geotiff_info)

    g = np.zeros((20, 30), np.uint8)
    blob = encode_geotiff(g, pixel_scale=(0.1, 0.2), tiepoint_xy=(10.0, 50.0),
                          epsg=4326)
    info = geotiff_info(blob)
    assert info["epsg"] == 4326 and info["model_type"] == 2
    assert info["transform"] == (0.1, 0.0, 10.0, 0.0, -0.2, 50.0)
    assert np.allclose(info["bbox"], (10.0, 46.0, 13.0, 50.0))
    assert geotiff_bbox_lonlat(info) == pytest.approx(info["bbox"])
    # projected: UTM 18N footprint lands at ~(-75, 42) in lon/lat
    blob = encode_geotiff(g, pixel_scale=(30.0, 30.0),
                          tiepoint_xy=(500_000.0, 4_649_776.0), epsg=32618)
    info = geotiff_info(blob)
    assert info["epsg"] == 32618 and info["model_type"] == 1
    ll = geotiff_bbox_lonlat(info)
    assert ll is not None and -75.1 < ll[0] < -74.9 and 41.9 < ll[1] < 42.1
    # r5: 27700 is now a supported CRS — grid (0,0) resolves to the
    # true British-grid origin ~7°33'W 49°46'N
    blob = encode_geotiff(g, pixel_scale=(1.0, 1.0), tiepoint_xy=(0.0, 0.0),
                          epsg=27700)
    ll = geotiff_bbox_lonlat(geotiff_info(blob))
    assert ll is not None and abs(ll[0] - -7.5571) < 5e-3
    # unsupported EPSG (2056 Swiss LV95): None, never a guess
    blob = encode_geotiff(g, pixel_scale=(1.0, 1.0), tiepoint_xy=(0.0, 0.0),
                          epsg=2056)
    assert geotiff_bbox_lonlat(geotiff_info(blob)) is None
    # PixelIsPoint pads the extent half a pixel on every side
    blob = encode_geotiff(g, pixel_scale=(1.0, 1.0), tiepoint_xy=(5.0, 8.0),
                          epsg=4326, raster_type=2)
    info = geotiff_info(blob)
    assert np.allclose(info["bbox"], (4.5, 8.0 - 20 + 0.5, 5.0 + 30 - 0.5, 8.5))


def test_transcode_images_tiff_target(spark):
    """tiff joins the lossless storage targets of transcode_images."""
    from geomesa_sql_spark.io.images import encode_png
    from geomesa_sql_spark.ops import transcode_images

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (9, 12, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [("a", bytes(encode_png(px)), 12, 9, "png")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    r = transcode_images(df, to="tiff").collect()[0]
    assert r.fmt == "tiff" and r.psnr_db == float("inf")
    assert (decode_tiff(bytes(r.bytes)) == px).all()


def test_overview_pyramid_pages():
    """Multi-IFD chains (the GeoTIFF overview-pyramid convention):
    every page decodes at its own scale with its own geo tags."""
    from geomesa_sql_spark.io.tiff import (
        decode_tiff_raster, encode_geotiff, geotiff_info, tiff_page_count)

    rng = np.random.default_rng(31)
    g = rng.integers(0, 4096, (64, 48)).astype(np.uint16)
    blob = encode_geotiff(g, pixel_scale=(0.01, 0.01), tiepoint_xy=(10.0, 50.0),
                          epsg=4326, compression="lzw", overviews=3)
    assert tiff_page_count(blob) == 4
    s0, i0 = decode_tiff_raster(blob)
    assert (s0[..., 0] == g).all()
    for k in (1, 2, 3):
        sk, ik = decode_tiff_raster(blob, page=k)
        assert (sk[..., 0] == g[:: 1 << k, :: 1 << k]).all()
        assert ik["pixel_scale"][0] == 0.01 * (1 << k)
        assert ik["epsg"] == 4326
        # overview bboxes cover the same upper-left anchor
        assert ik["bbox"][0] == i0["bbox"][0] and ik["bbox"][3] == i0["bbox"][3]
    info2 = geotiff_info(blob, page=2)
    assert (info2["w"], info2["h"]) == (12, 16)
    with pytest.raises(ValueError, match="out of range"):
        decode_tiff_raster(blob, page=9)
    # single-page files still report one page
    one = encode_geotiff(g, pixel_scale=(1, 1), tiepoint_xy=(0, 0))
    assert tiff_page_count(one) == 1


def test_jpeg_in_tiff_cmyk_photometric_5():
    """Separated (CMYK) JPEG-in-TIFF rides the 4-component decode of
    io/jpeg.py (Adobe inverted-ink convention)."""
    from geomesa_sql_spark.io.jpeg import Q_LUM, _quality_scale
    from geomesa_sql_spark.io.tiff import _write_ifd
    from tests.test_jpeg import _cmyk_stream

    h, w = 16, 24
    yy, xx = np.mgrid[0:h, 0:w]
    cp = np.clip(60 + xx * 5, 0, 255).astype(np.float64)
    mp = np.clip(80 + yy * 5, 0, 255).astype(np.float64)
    yp = np.clip(100 + (xx + yy) * 2, 0, 255).astype(np.float64)
    kp = np.clip(150 + xx * 2, 0, 255).astype(np.float64)
    want = np.clip(
        (np.stack([cp, mp, yp], axis=-1) * kp[..., None] / 255.0).round(),
        0, 255).astype(np.uint8)
    q = _quality_scale(Q_LUM, 95)
    seg = _cmyk_stream([cp, mp, yp, kp], q, transform=0)
    blob = _write_ifd([
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8, 8]), (259, 3, [7]),
        (262, 3, [5]), (273, 4, [0]), (277, 3, [4]), (278, 4, [h]),
        (279, 4, [len(seg)]),
    ], [seg], 273)
    got = decode_tiff(blob).astype(np.int64)
    mse = float(((got - want.astype(np.int64)) ** 2).mean())
    assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-12)) >= 40.0


def test_bigtiff_roundtrip_and_rejections():
    """BigTIFF (version 43, 8-byte offsets): the layout multi-GB
    GeoTIFFs actually ship in — strip/tiled, overview chains, and the
    full geo-tag surface, plus malformed-header honesty."""
    from geomesa_sql_spark.io.tiff import (
        decode_tiff_raster, encode_geotiff, tiff_page_count)

    rng = np.random.default_rng(41)
    g = rng.integers(0, 4096, (50, 37)).astype(np.uint16)
    for tile, comp, ov in ((None, "lzw", 0), (16, "deflate", 2)):
        blob = encode_geotiff(
            g, pixel_scale=(0.01, 0.02), tiepoint_xy=(5.0, 40.0), epsg=4326,
            tile=tile, compression=comp, overviews=ov, bigtiff=True)
        assert blob[:4] == b"II+\x00"
        s, info = decode_tiff_raster(blob)
        assert (s[..., 0] == g).all() and info["epsg"] == 4326
        assert info["bbox"][0] == 5.0 and info["bbox"][3] == 40.0
        assert tiff_page_count(blob) == 1 + ov
        if ov:
            s1, _ = decode_tiff_raster(blob, page=1)
            assert (s1[..., 0] == g[::2, ::2]).all()
        assert decode_tiff(blob).shape == (50, 37, 3)
    # malformed BigTIFF header: offset size must be 8
    blob = bytearray(encode_geotiff(
        g, pixel_scale=(1, 1), tiepoint_xy=(0, 0), bigtiff=True))
    blob[4] = 4
    with pytest.raises(ValueError, match="non-8-byte"):
        decode_tiff(bytes(blob))
    # unknown version: not a TIFF
    blob[2:4] = b"\x2c\x00"
    with pytest.raises(ValueError, match="II\\*"):
        decode_tiff(bytes(blob))
