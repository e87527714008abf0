"""Randomized cross-codec laws.

1. Round-trip law: random content survives encode→decode bit-exact for
   every lossless codec (png/webp/gif/bmp/raw; flac/wav), and above the
   PSNR bar for jpeg.
2. Robustness law: MUTATED streams (byte flips, truncations, random
   prefixes) either decode to SOMETHING or raise ValueError /
   NotImplementedError — never IndexError/KeyError/struct.error (which
   would escape the null-row `except Exception` guards as confusing
   task logs, and signal unvalidated offsets), and never hang.

The r4f review found two escapes of exactly this class (GIF GCE
IndexError, image-descriptor struct.error); this pins the whole
surface.
"""

import struct
import zlib

import numpy as np
import pytest

from geomesa_sql_spark.io.containers import decode_wav, encode_wav, mjpeg_avi_frames
from geomesa_sql_spark.io.flac import decode_flac, encode_flac
from geomesa_sql_spark.io.gif import decode_gif, encode_gif
from geomesa_sql_spark.io.images import (
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
    psnr,
)
from geomesa_sql_spark.io.jpeg import decode_jpeg, encode_jpeg
from geomesa_sql_spark.io.tiff import decode_tiff, encode_tiff
from geomesa_sql_spark.io.webp import decode_webp, encode_webp

OK_ERRORS = (ValueError, NotImplementedError, zlib.error)


def _rand_img(rng, max_side=33, colors=None):
    h = int(rng.integers(1, max_side))
    w = int(rng.integers(1, max_side))
    if colors:
        pal = rng.integers(0, 256, (colors, 3)).astype(np.uint8)
        return pal[rng.integers(0, colors, (h, w))]
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


def test_lossless_image_roundtrip_law():
    rng = np.random.default_rng(42)
    for trial in range(12):
        img = _rand_img(rng)
        assert (decode_png(encode_png(img)) == img).all()
        assert (decode_webp(encode_webp(img)) == img).all()
        assert (decode_bmp(encode_bmp(img)) == img).all()
        comp = ("none", "packbits", "lzw", "deflate")[trial % 4]
        assert (decode_tiff(encode_tiff(img, comp, predictor=trial % 2 == 0))
                == img).all()
        gimg = _rand_img(rng, colors=int(rng.integers(2, 257)))
        assert (decode_gif(encode_gif(gimg)) == gimg).all()


def test_jpeg_psnr_law():
    rng = np.random.default_rng(43)
    for trial in range(4):
        # smooth content (JPEG's PSNR bar is for natural images, not noise)
        h = int(rng.integers(16, 64))
        w = int(rng.integers(16, 64))
        yy, xx = np.mgrid[0:h, 0:w]
        a, b, c = rng.integers(1, 6, 3)
        img = np.stack(
            [(xx * a) % 256, (yy * b) % 256, ((xx + yy) * c) % 256], -1
        ).astype(np.uint8)
        assert psnr(img, decode_jpeg(encode_jpeg(img, quality=90))) >= 36.0


def test_audio_roundtrip_law():
    rng = np.random.default_rng(44)
    for trial in range(8):
        n = int(rng.integers(1, 9000))
        ch = int(rng.integers(1, 3))
        x = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
        got, rate = decode_wav(encode_wav(x, 8000))
        assert rate == 8000 and (got == x).all()
        bs = int(rng.integers(16, 4097))
        dec, _ = decode_flac(encode_flac(x, 8000, block_size=bs))
        assert (dec == x).all()
        from geomesa_sql_spark.io.ogg import decode_ogg, encode_ogg_flac

        dec, _ = decode_ogg(encode_ogg_flac(x, 8000, block_size=bs))
        assert (dec == x).all()


def _mutations(rng, blob, rounds):
    """Byte flips, truncations, and garbage splices of a valid stream."""
    for _ in range(rounds):
        b = bytearray(blob)
        kind = rng.integers(0, 3)
        if kind == 0 and len(b):  # flip 1-4 bytes
            for _ in range(int(rng.integers(1, 5))):
                b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
            yield bytes(b)
        elif kind == 1:  # truncate anywhere
            yield bytes(b[: int(rng.integers(0, len(b) + 1))])
        else:  # splice random garbage into the middle
            at = int(rng.integers(0, len(b) + 1))
            yield bytes(b[:at]) + rng.bytes(int(rng.integers(1, 40))) + bytes(b[at:])


@pytest.mark.parametrize(
    "name,decode,build",
    [
        ("png", decode_png, lambda rng: encode_png(_rand_img(rng))),
        ("webp", decode_webp, lambda rng: encode_webp(_rand_img(rng))),
        ("bmp", decode_bmp, lambda rng: encode_bmp(_rand_img(rng))),
        ("gif", decode_gif, lambda rng: encode_gif(_rand_img(rng, colors=20))),
        (
            "jpeg",
            decode_jpeg,
            lambda rng: encode_jpeg(_rand_img(rng), quality=85),
        ),
        (
            "flac",
            decode_flac,
            lambda rng: encode_flac(
                rng.integers(-32768, 32768, 700).astype(np.int16), 8000
            ),
        ),
        (
            "tiff",
            decode_tiff,
            lambda rng: encode_tiff(_rand_img(rng), "lzw", predictor=True),
        ),
        ("bigtiff", lambda b: __import__(
            "geomesa_sql_spark.io.tiff", fromlist=["decode_tiff_raster"]
        ).decode_tiff_raster(b), lambda rng: __import__(
            "geomesa_sql_spark.io.tiff", fromlist=["encode_geotiff"]
        ).encode_geotiff(
            _rand_img(rng)[..., 0], pixel_scale=(0.1, 0.1),
            tiepoint_xy=(1.0, 2.0), epsg=4326, tile=16,
            compression="deflate", overviews=1, bigtiff=True)),
        ("mp4", lambda b: __import__(
            "geomesa_sql_spark.io.mp4", fromlist=["mp4_frames"]
        ).mp4_frames(b), lambda rng: __import__(
            "geomesa_sql_spark.io.mp4", fromlist=["encode_mjpeg_mp4"]
        ).encode_mjpeg_mp4(
            [encode_jpeg(_rand_img(rng, 17), quality=80) for _ in range(2)],
            8, 8)),
        ("wav", decode_wav, lambda rng: encode_wav(
            rng.integers(-32768, 32768, 700).astype(np.int16), 8000)),
        ("ogg", lambda b: __import__(
            "geomesa_sql_spark.io.ogg", fromlist=["decode_ogg"]
        ).decode_ogg(b), lambda rng: __import__(
            "geomesa_sql_spark.io.ogg", fromlist=["encode_ogg_flac"]
        ).encode_ogg_flac(
            rng.integers(-32768, 32768, 700).astype(np.int16), 8000)),
        ("avi", mjpeg_avi_frames, lambda rng: __import__(
            "geomesa_sql_spark.io.containers", fromlist=["encode_mjpeg_avi"]
        ).encode_mjpeg_avi(
            [encode_jpeg(_rand_img(rng, 17), quality=80) for _ in range(2)], 8, 8
        )),
        ("mvt", lambda b: __import__(
            "geomesa_sql_spark.io.mvt", fromlist=["decode_tile"]
        ).decode_tile(b), lambda rng: __import__(
            "geomesa_sql_spark.io.mvt", fromlist=["encode_point_layer"]
        ).encode_point_layer(
            "p", rng.integers(0, 4096, 40), rng.integers(0, 4096, 40),
            ids=np.arange(40))),
    ],
)
def test_codec_robustness_law(name, decode, build):
    # crc32, not hash(): str hashing is salted per process, which would
    # make this law explore different mutations every run — a failure
    # that can't be reproduced is a flake, not a gate
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    blob = build(rng)
    decode(blob)  # the unmutated stream must decode
    for mutated in _mutations(rng, blob, 60):
        try:
            decode(mutated)
        except OK_ERRORS:
            pass  # clean rejection is the contract
        except (struct.error, IndexError, KeyError, OverflowError) as ex:
            raise AssertionError(
                f"{name}: {type(ex).__name__} escaped on mutated input: {ex}"
            ) from ex
