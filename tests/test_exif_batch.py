"""Byte-identity of the r6 batched GPS-TIFF builder against
build_exif_tiff (the geotag batch path must be a pure speedup)."""

import numpy as np

from geomesa_sql_spark.io.exif import (
    build_exif_tiff,
    build_gps_tiff_batch,
    inject_exif_png,
    parse_exif,
)


def _coords(rng, g):
    lon = rng.uniform(-180, 180, g)
    lat = rng.uniform(-90, 90, g)
    # exact-degree / exact-minute edges where truncate-vs-floor and
    # round-half-even could diverge
    lon[:4] = [0.0, -180.0, 30.0, -0.5]
    lat[:4] = [0.0, 90.0, -45.25, 0.0000005]
    return lon, lat


def test_gps_tiff_batch_byte_identical():
    rng = np.random.RandomState(21)
    g = 200
    lon, lat = _coords(rng, g)
    out = build_gps_tiff_batch(lon, lat)
    for i in range(g):
        assert (
            out[i].tobytes()
            == build_exif_tiff(lon=float(lon[i]), lat=float(lat[i]))
        ), (lon[i], lat[i])


def test_gps_tiff_batch_with_alt_byte_identical():
    rng = np.random.RandomState(22)
    g = 100
    lon, lat = _coords(rng, g)
    alt = rng.uniform(-4.0e6, 4.0e6, g)
    alt[:3] = [0.0, -0.0005, 3_999_999.9996]
    out = build_gps_tiff_batch(lon, lat, alt)
    for i in range(g):
        assert out[i].tobytes() == build_exif_tiff(
            lon=float(lon[i]), lat=float(lat[i]), alt=float(alt[i])
        ), (lon[i], lat[i], alt[i])


def test_batch_block_parses_back():
    out = build_gps_tiff_batch([12.5], [-33.25])
    d = parse_exif(out[0].tobytes())
    assert abs(d["lon"] - 12.5) < 1e-9 and abs(d["lat"] + 33.25) < 1e-9
    # and through the PNG container round-trip
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(12) for _ in range(4))
    idat = zlib.compress(raw, 1)

    def chunk(t, dta):
        return (
            struct.pack(">I", len(dta))
            + t
            + dta
            + struct.pack(">I", zlib.crc32(t + dta) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    tagged = inject_exif_png(png, lon=12.5, lat=-33.25)
    got = parse_exif(tagged)
    assert abs(got["lon"] - 12.5) < 1e-9
