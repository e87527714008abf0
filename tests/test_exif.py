"""EXIF parse/write round-trips and the image_exif Spark operator —
the image↔geospatial bridge (io/exif.py reuses io/tiff's IFD walker;
fixtures are real JPEGs from the repo's own encoder with APP1
injected by the repo's own writer)."""

import struct

import numpy as np
import pandas as pd
import pytest

from geomesa_sql_spark.io.exif import (
    build_exif_tiff,
    inject_exif_jpeg,
    parse_exif,
)
from geomesa_sql_spark.io.jpeg import encode_jpeg


def _jpeg(seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    return encode_jpeg(px, 90)


GPS_CASES = [
    # (lon, lat, alt) — all four sign quadrants + below sea level
    (2.2945, 48.858222, 35.0),        # NE (Eiffel Tower)
    (-122.4194, 37.7749, 16.0),       # NW (San Francisco)
    (151.2093, -33.8688, 3.0),        # SE (Sydney)
    (-70.6693, -33.4489, -25.5),      # SW, below sea level
    (179.999, -0.0005, 0.0),          # antimeridian + tiny southern lat
]


@pytest.mark.parametrize("lon,lat,alt", GPS_CASES)
@pytest.mark.parametrize("byte_order", ["II", "MM"])
def test_exif_gps_roundtrip(lon, lat, alt, byte_order):
    j = inject_exif_jpeg(
        _jpeg(), lon=lon, lat=lat, alt=alt, orientation=6,
        make="ACME", model="Cam 9", datetime="2026:08:20 12:00:00",
        byte_order=byte_order,
    )
    d = parse_exif(j)
    assert d is not None
    # DMS seconds carry 1e-6 precision → ≤ ~3e-10 degrees of error
    assert abs(d["lon"] - lon) < 1e-8
    assert abs(d["lat"] - lat) < 1e-8
    assert abs(d["alt"] - alt) < 1e-3
    assert d["orientation"] == 6
    assert d["make"] == "ACME" and d["model"] == "Cam 9"
    assert d["datetime"] == "2026:08:20 12:00:00"
    # the decoded image is unaffected by the injected segment
    from geomesa_sql_spark.io.jpeg import decode_jpeg

    assert np.array_equal(decode_jpeg(j), decode_jpeg(_jpeg()))


def test_exif_bare_tiff_block_and_partial_fields():
    # the APP1 payload sans header IS a TIFF: parse it directly
    t = build_exif_tiff(lat=10.5, lon=None, make="X")
    d = parse_exif(t)
    assert d["lat"] == pytest.approx(10.5, abs=1e-8)
    assert d["lon"] is None and d["alt"] is None
    assert d["make"] == "X" and d["model"] is None
    assert d["datetime"] is None and d["orientation"] is None


def test_exif_absent_corrupt_and_null_are_none():
    assert parse_exif(None) is None
    assert parse_exif(b"") is None
    assert parse_exif(b"garbage") is None
    assert parse_exif(_jpeg()) is None  # plain JPEG: no APP1
    j = inject_exif_jpeg(_jpeg(), lat=1.0, lon=2.0)
    # truncate inside the APP1 payload: loud-less None, not a crash
    assert parse_exif(j[:30]) is None
    # corrupt the TIFF header inside APP1
    bad = bytearray(j)
    at = bad.index(b"Exif\x00\x00") + 6
    bad[at : at + 2] = b"ZZ"
    assert parse_exif(bytes(bad)) is None
    # APP1 that is not Exif (e.g. XMP) is skipped, not misparsed
    xmp = b"\xff\xe1" + struct.pack(">H", 12) + b"http://ns.x"
    assert parse_exif(b"\xff\xd8" + xmp + _jpeg()[2:]) is None


def test_exif_type_confused_tags_yield_none_not_raise():
    """r5 review: a tag whose declared TYPE is wrong (orientation as
    ASCII → _read_ifd returns bytes) must NULL that field, not raise
    out of the parse and kill an Arrow batch."""
    t = bytearray(build_exif_tiff(lat=1.5, lon=2.5, orientation=6))
    # IFD0 entries start at offset 10 (header 8 + count 2); find the
    # orientation entry and flip its type field SHORT→ASCII
    n = struct.unpack_from("<H", t, 8)[0]
    for k in range(n):
        at = 10 + 12 * k
        tag, typ = struct.unpack_from("<HH", t, at)
        if tag == 0x0112:
            struct.pack_into("<H", t, at + 2, 2)  # ASCII
    d = parse_exif(bytes(t))
    assert d is not None
    assert d["orientation"] is None  # confused field nulled
    assert d["lat"] == pytest.approx(1.5, abs=1e-8)  # rest survives


def test_exif_fill_bytes_and_eoi_in_walk():
    """r5 review: legal 0xFF fill bytes before a marker (B.1.1.2) and
    a standalone EOI must not derail the APP1 walk — io/jpeg's decoder
    accepts such files, so the EXIF walk must too."""
    j = inject_exif_jpeg(_jpeg(), lat=3.25, lon=-4.5)
    seg_len = struct.unpack(">H", j[4:6])[0] + 2
    app1 = j[2 : 2 + seg_len]
    rest = j[2 + seg_len :]
    padded = b"\xff\xd8" + b"\xff" + app1 + rest  # fill byte first
    d = parse_exif(padded)
    assert d and d["lat"] == pytest.approx(3.25, abs=1e-8)
    # EOI before any APP1: clean None (no garbage length read)
    assert parse_exif(b"\xff\xd8\xff\xd9" + app1) is None


def test_exif_png_exif_chunk_roundtrip():
    """PNG eXIf chunk: inject after IHDR, parse back; the PNG still
    decodes identically (ancillary chunk skipped by the decoder)."""
    from geomesa_sql_spark.io.exif import inject_exif_png
    from geomesa_sql_spark.io.images import decode_image, encode_png

    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
    png = encode_png(px)
    tagged = inject_exif_png(png, lon=-73.9857, lat=40.7484, alt=381.0)
    d = parse_exif(tagged)
    assert d["lon"] == pytest.approx(-73.9857, abs=1e-8)
    assert d["lat"] == pytest.approx(40.7484, abs=1e-8)
    assert d["alt"] == pytest.approx(381.0, abs=1e-3)
    assert np.array_equal(decode_image(tagged, "png", 9, 9), px)
    assert parse_exif(png) is None  # untagged PNG: clean None
    # truncated chunk table: clean None
    assert parse_exif(tagged[:20]) is None
    with pytest.raises(ValueError):
        inject_exif_png(b"\x89PNG\r\n\x1a\n", lat=1.0)  # truncated


def test_geotag_png_payloads(spark):
    """geotag_images dispatches on the payload signature: PNG rows
    get an eXIf chunk and round-trip through image_exif like JPEGs."""
    from geomesa_sql_spark.io.images import encode_png
    from geomesa_sql_spark.ops import geotag_images, image_exif

    rng = np.random.default_rng(5)
    png = encode_png(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
    rows = [
        ("p0", png, 12.5, -8.25),
        ("j0", _jpeg(1), -100.0, 45.0),
        ("r0", b"\x00raw", 1.0, 2.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "lon", "lat"])
    )
    tagged = geotag_images(df)
    got = tagged.toPandas().set_index("image_id")
    assert bool(got.loc["p0"].tagged) and bool(got.loc["j0"].tagged)
    assert not got.loc["r0"].tagged
    back = image_exif(tagged).toPandas().set_index("image_id")
    assert back.loc["p0"].exif_lon == pytest.approx(12.5, abs=1e-8)
    assert back.loc["p0"].exif_lat == pytest.approx(-8.25, abs=1e-8)
    assert back.loc["j0"].exif_lon == pytest.approx(-100.0, abs=1e-8)
    assert pd.isna(back.loc["r0"].exif_lon)


def test_strip_exif_inverse_law_and_selectivity():
    """strip_exif(inject_exif_*(x)) == (x, True) byte-for-byte; other
    APP1s (XMP) and ancillary PNG chunks survive; EXIF-less payloads
    return unchanged with False."""
    from geomesa_sql_spark.io.exif import inject_exif_png, strip_exif
    from geomesa_sql_spark.io.images import encode_png

    j = _jpeg(0)
    tagged = inject_exif_jpeg(j, lat=1.5, lon=2.5, alt=3.0)
    assert parse_exif(tagged)["lat"] == pytest.approx(1.5, abs=1e-8)
    out, changed = strip_exif(tagged)
    assert changed and out == j  # exact inverse
    assert parse_exif(out) is None
    assert strip_exif(j) == (j, False)  # untouched without EXIF

    # an XMP APP1 (not Exif) must survive the scrub
    xmp = b"\xff\xe1" + struct.pack(">H", 13) + b"http://ns.x"
    mixed = j[:2] + xmp + tagged[2:]
    out2, changed2 = strip_exif(mixed)
    assert changed2 and out2 == j[:2] + xmp + j[2:]

    rng = np.random.default_rng(7)
    png = encode_png(rng.integers(0, 256, (7, 7, 3), dtype=np.uint8))
    ptag = inject_exif_png(png, lat=-9.75, lon=44.5)
    pout, pch = strip_exif(ptag)
    assert pch and pout == png
    assert strip_exif(png) == (png, False)
    assert strip_exif(None) == (None, False)
    assert strip_exif(b"raw") == (b"raw", False)


def test_strip_exif_covers_tiff_and_trailers():
    """r5 review: the scrub must also cover (a) bare TIFF payloads —
    parse_exif reads their GPS, so the scrub zeroes the GPS IFD in
    place; (b) a second image concatenated after EOI/IEND; (c) a
    chunk-shaped eXIf after IEND. And the no-EXIF path returns the
    SAME object (zero copies)."""
    from geomesa_sql_spark.io.exif import (
        build_exif_tiff,
        inject_exif_png,
        strip_exif,
    )
    from geomesa_sql_spark.io.images import encode_png

    # (a) bare TIFF: GPS gone, non-GPS fields survive, length equal
    t = build_exif_tiff(lat=48.85, lon=2.29, alt=35.0, make="ACME",
                        datetime="2026:01:01 00:00:00")
    out, changed = strip_exif(t)
    assert changed and len(out) == len(t)
    d = parse_exif(out)
    assert d["lat"] is None and d["lon"] is None and d["alt"] is None
    assert d["make"] == "ACME" and d["datetime"] == "2026:01:01 00:00:00"
    assert strip_exif(out) == (out, False)  # idempotent
    # big-endian variant too
    tm = build_exif_tiff(lat=-3.5, lon=7.25, byte_order="MM")
    om, chm = strip_exif(tm)
    assert chm and parse_exif(om)["lat"] is None

    # (b) concatenated second JPEG carrying the EXIF
    j = _jpeg(0)
    tagged = inject_exif_jpeg(_jpeg(1), lat=1.5, lon=2.5)
    cat = j + tagged
    out2, ch2 = strip_exif(cat)
    assert ch2 and out2 == j + _jpeg(1)
    assert b"Exif\x00\x00" not in out2

    # (c) chunk-shaped eXIf appended after IEND
    rng = np.random.default_rng(9)
    png = encode_png(rng.integers(0, 256, (6, 6, 3), dtype=np.uint8))
    ptag = inject_exif_png(png, lat=5.5, lon=6.5)
    seg_len = struct.unpack(">I", ptag[33:37])[0] + 12  # eXIf chunk
    exif_chunk = ptag[33 : 33 + seg_len]
    smug = png + exif_chunk
    out3, ch3 = strip_exif(smug)
    assert ch3 and out3 == png
    # and a whole PNG concatenated after a JPEG
    out4, ch4 = strip_exif(j + ptag)
    assert ch4 and out4 == j + png

    # zero-copy pass-through: same object back
    out5, ch5 = strip_exif(j)
    assert not ch5 and out5 is j


def test_strip_exif_degenerate_chain_and_chained_ifd():
    """r5 review round 2: (a) a degenerate chain of thousands of
    minimal SOI/EOI pairs must scrub in O(n) with no RecursionError;
    (b) GPS hidden in a CHAINED IFD (IFD1 via the next-IFD pointer)
    is zeroed like IFD0's; (c) a mid-chain TIFF ends the structural
    scan (documented: its extent is not self-delimiting) but its own
    GPS is still zeroed."""
    from geomesa_sql_spark.io.exif import (
        build_exif_tiff,
        inject_exif_jpeg,
        strip_exif,
    )

    # (a) 3000 back-to-back minimal JPEGs, one tagged in the middle
    j = _jpeg(0)
    tiny = b"\xff\xd8\xff\xd9"
    chain = tiny * 1500 + inject_exif_jpeg(j, lat=1.5, lon=2.5) + tiny * 1500
    out, changed = strip_exif(chain)
    assert changed and out == tiny * 1500 + j + tiny * 1500
    no_exif, ch2 = strip_exif(tiny * 3000)
    assert not ch2 and no_exif is not None

    # (b) GPS pointer hidden in a chained IFD1, hand-assembled:
    # header → empty IFD0 (next → 14) → IFD1 at 14 carrying the GPS
    # pointer → GPS IFD at 32 (LatRef inline + 3 Lat rationals in the
    # heap at 62)
    import struct as _s

    hidden = b"II" + _s.pack("<HI", 42, 8)
    hidden += _s.pack("<HI", 0, 14)  # IFD0: 0 entries, next = 14
    hidden += _s.pack("<H", 1)  # IFD1: 1 entry
    hidden += _s.pack("<HHII", 0x8825, 4, 1, 32)  # GPS pointer → 32
    hidden += _s.pack("<I", 0)  # IFD1 next = 0
    hidden += _s.pack("<H", 2)  # GPS IFD: 2 entries
    hidden += _s.pack("<HHI", 1, 2, 2) + b"N\x00\x00\x00"  # LatRef
    hidden += _s.pack("<HHII", 2, 5, 3, 62)  # Lat: 3 RATIONALs @62
    hidden += _s.pack("<I", 0)  # GPS next = 0
    hidden += _s.pack("<6I", 9, 1, 30, 1, 0, 1)  # 9° 30' 0"
    assert len(hidden) == 86
    d0 = parse_exif(hidden)
    assert d0 is not None and d0["lat"] is None  # IFD0 carries nothing
    # but a CHAIN-walking reader finds the GPS in IFD1 — prove the
    # data is really there by parsing from the chained IFD directly
    from geomesa_sql_spark.io.tiff import _read_ifd

    ifd1 = _read_ifd(hidden, "<", 14, False)
    assert 0x8825 in ifd1
    gps_ifd = _read_ifd(hidden, "<", 32, False)
    assert gps_ifd[2] == [9.0, 30.0, 0.0]  # 9.5° readable pre-scrub
    out_h, ch_h = strip_exif(hidden)
    assert ch_h and len(out_h) == len(hidden)
    assert 0x8825 not in _read_ifd(out_h, "<", 14, False)
    assert out_h[32:62] == b"\x00" * 30  # GPS IFD block zeroed
    assert out_h[62:86] == b"\x00" * 24  # rationals zeroed
    assert strip_exif(out_h) == (out_h, False)  # idempotent

    # (c) TIFF mid-chain: its GPS zeroed, scan ends there
    mid = j + build_exif_tiff(lat=3.5, lon=4.5) + b"trailing-bytes"
    out_m, ch_m = strip_exif(mid)
    assert ch_m and len(out_m) == len(mid)
    assert out_m.endswith(b"trailing-bytes")
    assert parse_exif(out_m[len(j) : len(mid) - 14])["lat"] is None


def test_image_exif_survives_out_of_range_orientation(spark):
    """r5 review round 3: a hostile tag declaring orientation as LONG
    2^32-1 must NULL the field, not make pd.array(Int32) raise and
    kill the whole Arrow batch."""
    import struct as _s

    from geomesa_sql_spark.io.exif import build_exif_tiff
    from geomesa_sql_spark.ops import image_exif

    t = bytearray(build_exif_tiff(lat=1.5, lon=2.5, orientation=6))
    (n0,) = _s.unpack_from("<H", t, 8)
    for k in range(n0):
        at = 10 + 12 * k
        tag, typ = _s.unpack_from("<HH", t, at)
        if tag == 0x0112:
            _s.pack_into("<HHII", t, at, 0x0112, 4, 1, 0xFFFFFFFF)
    hostile = bytes(t)
    assert parse_exif(hostile)["orientation"] == 0xFFFFFFFF
    df = spark.createDataFrame(
        pd.DataFrame(
            [("h", hostile), ("ok", build_exif_tiff(lat=3.0, lon=4.0,
                                                    orientation=3))],
            columns=["image_id", "bytes"],
        )
    )
    got = image_exif(df).toPandas().set_index("image_id")
    assert pd.isna(got.loc["h"].exif_orientation)
    assert got.loc["h"].exif_lat == pytest.approx(1.5, abs=1e-8)
    assert got.loc["ok"].exif_orientation == 3


def test_strip_exif_lenient_on_broken_chain_and_gps_ifd():
    """r5 review round 3: one hostile byte must not void the scrub.
    (a) IFD0's next-IFD pointer set past EOF: the GPS that IFD0
    itself carries is STILL zeroed; (b) the GPS sub-IFD's entry count
    inflated past EOF: the pointer entry and every addressable GPS
    value are still zeroed."""
    import struct as _s

    from geomesa_sql_spark.io.exif import build_exif_tiff, strip_exif
    from geomesa_sql_spark.io.tiff import _ifd_spans

    # (a) break the next-IFD chain link
    t = bytearray(build_exif_tiff(lat=10.5, lon=20.25))
    (n0,) = _s.unpack_from("<H", t, 8)
    next_at = 8 + 2 + 12 * n0
    _s.pack_into("<I", t, next_at, 0xFFFFFF00)  # hostile chain link
    broken = bytes(t)
    assert parse_exif(broken)["lat"] == pytest.approx(10.5, abs=1e-8)
    out, changed = strip_exif(broken)
    assert changed
    assert parse_exif(out)["lat"] is None and parse_exif(out)["lon"] is None

    # (b) inflate the GPS IFD's entry count so its table runs off EOF
    t2 = bytearray(build_exif_tiff(lat=-7.5, lon=3.25))
    _, spans0 = _ifd_spans(bytes(t2), "<", 8, False)
    (gps_entry,) = [sp for sp in spans0 if sp[0] == 0x8825]
    (gps_off,) = _s.unpack_from("<I", t2, gps_entry[3] + 8)
    _s.pack_into("<H", t2, gps_off, 4000)  # absurd entry count
    hostile = bytes(t2)
    out2, ch2 = strip_exif(hostile)
    assert ch2
    # the GPS pointer entry in IFD0 is zeroed: no reader can FOLLOW
    # to the GPS IFD any more, and the valid leading entries' value
    # bytes (the lat/lon rationals) are zeroed too
    d2 = parse_exif(out2)
    assert d2["lat"] is None and d2["lon"] is None
    # every original GPS rational byte region is now zeros
    _, gspans = _ifd_spans(hostile, "<", gps_off, False, strict=False)
    for _tag, _typ, _cnt, _at, vat, total in gspans:
        if total:
            assert out2[vat : vat + total] == b"\x00" * total


def test_exif_fuzz_never_raises_and_scrub_always_degpses():
    """Property fuzz over adversarial payloads: random container
    chains assembled from valid pieces (tagged/untagged JPEG/PNG/TIFF,
    tiny SOI/EOI pairs, garbage) plus random byte mutations. Laws:
    (1) parse_exif and strip_exif never raise; (2) after one scrub,
    parse_exif reads no GPS; (3) scrubbing an unmutated chain that
    carried no EXIF returns the identical object; (4) scrub is
    idempotent on its own output."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from geomesa_sql_spark.io.exif import (
        build_exif_tiff,
        inject_exif_png,
        strip_exif,
    )
    from geomesa_sql_spark.io.images import encode_png

    rng = np.random.default_rng(0)
    png = encode_png(rng.integers(0, 256, (5, 5, 3), dtype=np.uint8))
    j = _jpeg(0)
    pieces = [
        j,
        png,
        inject_exif_jpeg(j, lat=1.5, lon=2.5),
        inject_exif_png(png, lat=-3.25, lon=4.75),
        build_exif_tiff(lat=5.5, lon=-6.5),
        build_exif_tiff(make="X"),  # TIFF without GPS
        b"\xff\xd8\xff\xd9",
        b"garbage-trailer",
        b"",
    ]
    has_exif = [False, False, True, True, True, False, False, False,
                False]

    @settings(max_examples=120, deadline=None)
    @given(
        idxs=st.lists(st.integers(0, len(pieces) - 1), min_size=1,
                      max_size=6),
        mutate=st.one_of(
            st.none(),
            st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
        ),
    )
    def law(idxs, mutate):
        payload = b"".join(pieces[i] for i in idxs)
        clean = mutate is None
        if mutate is not None and payload:
            pos, val = mutate
            b = bytearray(payload)
            b[pos % len(b)] = val
            payload = bytes(b)
        d = parse_exif(payload)  # law 1: never raises
        out, changed = strip_exif(payload)
        # law 2 is guaranteed only where the structural scan reaches:
        # a bare-TIFF member ends it (documented), so check the
        # parseable surface — parse_exif follows the same walkers
        d2 = parse_exif(out)
        if d2 is not None:
            assert d2["lat"] is None and d2["lon"] is None
        if clean and not any(has_exif[i] for i in idxs):
            # law 3: EXIF-free unmutated chains pass through untouched
            assert not changed and out is payload
        out2, changed2 = strip_exif(out)
        if changed:
            # law 4: idempotent — except a TIFF member that ended the
            # first scan before a later member (can't distinguish
            # cheaply here), so only assert when scan covered all
            if not any(pieces[i][:2] in (b"II", b"MM") for i in idxs):
                assert not changed2 and out2 is out

    law()


def test_scrub_exif_images_operator(spark):
    """Spark scrub op: tagged rows come back byte-identical to their
    pre-tag payloads with scrubbed=true; untagged rows pass through."""
    from geomesa_sql_spark.ops import geotag_images, scrub_exif_images

    rows = [
        ("a", _jpeg(0), 10.0, 20.0),
        ("b", b"not an image", 1.0, 2.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "lon", "lat"])
    )
    scrubbed = scrub_exif_images(geotag_images(df)).toPandas().set_index(
        "image_id"
    )
    assert bool(scrubbed.loc["a"].scrubbed)
    assert bytes(scrubbed.loc["a"].bytes) == _jpeg(0)
    assert not scrubbed.loc["b"].scrubbed
    assert bytes(scrubbed.loc["b"].bytes) == b"not an image"


def test_geotag_truncated_and_hostile_png_pass_through(spark):
    """r5 review: a blob that LOOKS like a PNG (signature matches) but
    is truncated or carries a hostile IHDR length must pass through
    byte-identical with tagged=false — not crash the task (8-byte
    prefix) or mutate the payload while tagging=true (garbage insert
    offset)."""
    from geomesa_sql_spark.io.exif import inject_exif_png
    from geomesa_sql_spark.ops import geotag_images

    sig_only = b"\x89PNG\r\n\x1a\n"
    hostile = sig_only + b"\xff\xff\xff\x00IHDR"  # absurd ihdr_len
    short_ihdr = sig_only + struct.pack(">I", 13) + b"IHDR"  # truncated
    rows = [
        ("sig", sig_only, 1.0, 2.0),
        ("host", hostile, 1.0, 2.0),
        ("shrt", short_ihdr, 1.0, 2.0),
        ("ok", _jpeg(0), 3.0, 4.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "lon", "lat"])
    )
    got = geotag_images(df).toPandas().set_index("image_id")
    for k, blob in (("sig", sig_only), ("host", hostile), ("shrt", short_ihdr)):
        assert not got.loc[k].tagged
        assert bytes(got.loc[k].bytes) == blob  # byte-identical
    assert bool(got.loc["ok"].tagged)
    for bad in (sig_only, hostile, short_ihdr):
        with pytest.raises(ValueError):
            inject_exif_png(bad, lat=1.0)


def test_geotag_nonfinite_and_out_of_range_pass_through(spark):
    """r5 review: inf / huge coordinates would overflow the DMS
    rational encoding — they must pass through untagged, not crash
    the stage; an absurd altitude drops but position still tags."""
    from geomesa_sql_spark.ops import geotag_images

    rows = [
        ("inf", _jpeg(0), float("inf"), 1.0, 2.0),
        ("huge", _jpeg(1), 1.0e12, 1.0, 2.0),
        ("oob", _jpeg(2), 181.0, 1.0, 2.0),
        ("balt", _jpeg(3), 10.0, 20.0, 1.0e12),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "lon", "lat", "alt"])
    )
    got = geotag_images(df, alt_col="alt").toPandas().set_index("image_id")
    assert not got.loc["inf"].tagged and got.loc["inf"].bytes == _jpeg(0)
    assert not got.loc["huge"].tagged and not got.loc["oob"].tagged
    assert bool(got.loc["balt"].tagged)  # position tags, altitude drops
    d = parse_exif(bytes(got.loc["balt"].bytes))
    assert d["lon"] == pytest.approx(10.0, abs=1e-8)
    assert d["alt"] is None


def test_exif_app1_after_app0_is_found():
    """Real cameras often emit APP0(JFIF) before APP1 — the segment
    walk must skip over it."""
    j = _jpeg()
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    with_app0 = j[:2] + app0 + j[2:]
    tagged = inject_exif_jpeg(with_app0, lat=-5.25, lon=100.125)
    # move APP1 behind APP0: strip ours and re-inject after APP0
    seg_len = struct.unpack(">H", tagged[4:6])[0] + 2
    app1 = tagged[2 : 2 + seg_len]
    reordered = j[:2] + app0 + app1 + j[2:]
    d = parse_exif(reordered)
    assert d["lat"] == pytest.approx(-5.25, abs=1e-8)
    assert d["lon"] == pytest.approx(100.125, abs=1e-8)


def test_geotag_images_roundtrip_and_passthrough(spark):
    """Write direction: geotag_images stamps coordinates into JPEG
    payloads; image_exif reads them back to rational precision.
    Non-JPEG, NULL-payload, and NULL-coordinate rows pass through
    byte-identical with tagged=false."""
    import pyspark.sql.functions as F

    from geomesa_sql_spark.ops import geotag_images, image_exif

    rows = [
        ("a", _jpeg(0), -122.25, 37.125, 10.0),
        ("b", _jpeg(1), 151.5, -33.75, None),   # NULL alt: still tags
        ("c", b"not a jpeg", 1.0, 2.0, 3.0),    # passthrough
        ("d", None, 1.0, 2.0, 3.0),             # NULL payload
        ("e", _jpeg(2), None, 5.0, 6.0),        # NULL lon: no tag
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "lon", "lat", "alt"])
    )
    tagged = geotag_images(df, alt_col="alt")
    got = tagged.toPandas().set_index("image_id")
    assert bool(got.loc["a"].tagged) and bool(got.loc["b"].tagged)
    assert not got.loc["c"].tagged and not got.loc["e"].tagged
    assert got.loc["c"].bytes == b"not a jpeg"
    assert got.loc["d"].bytes is None
    assert got.loc["e"].bytes == _jpeg(2)

    back = (
        image_exif(tagged)
        .filter(F.col("exif_lon").isNotNull())
        .toPandas()
        .set_index("image_id")
    )
    assert sorted(back.index) == ["a", "b"]
    assert abs(back.loc["a"].exif_lon + 122.25) < 1e-8
    assert abs(back.loc["a"].exif_lat - 37.125) < 1e-8
    assert abs(back.loc["a"].exif_alt - 10.0) < 1e-3
    assert abs(back.loc["b"].exif_lon - 151.5) < 1e-8
    assert abs(back.loc["b"].exif_lat + 33.75) < 1e-8
    assert pd.isna(back.loc["b"].exif_alt)


def test_image_exif_operator_to_spatial_filter(spark):
    """The Spark operator end-to-end: mixed rows (geotagged, plain
    JPEG, NULL payload) → typed columns; the lon/lat columns drive a
    plain spatial filter like any engine point column."""
    from geomesa_sql_spark.ops import image_exif

    rows = []
    for i, (lon, lat, alt) in enumerate(GPS_CASES):
        rows.append(
            (f"img{i}", inject_exif_jpeg(_jpeg(i), lon=lon, lat=lat,
                                         alt=alt, model=f"M{i}"), i)
        )
    rows.append(("plain", _jpeg(9), 99))
    rows.append(("nullp", None, 100))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "tag"])
    )
    out = image_exif(df, carry=("tag",)).toPandas().set_index("image_id")
    assert len(out) == len(rows)
    for i, (lon, lat, alt) in enumerate(GPS_CASES):
        r = out.loc[f"img{i}"]
        assert abs(r.exif_lon - lon) < 1e-8
        assert abs(r.exif_lat - lat) < 1e-8
        assert abs(r.exif_alt - alt) < 1e-3
        assert r.exif_model == f"M{i}" and r.tag == i
    assert pd.isna(out.loc["plain"].exif_lon)
    assert pd.isna(out.loc["nullp"].exif_lon)
    assert out.loc["plain"].tag == 99  # carry survives EXIF-less rows

    # the bridge: EXIF points through a spatial predicate
    import pyspark.sql.functions as F

    western = (
        image_exif(df)
        .filter(F.col("exif_lon") < 0)
        .select("image_id")
        .toPandas()["image_id"]
        .tolist()
    )
    assert sorted(western) == ["img1", "img3"]
