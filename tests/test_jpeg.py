"""Real baseline JPEG codec (llmap_spark.jpeg): exact constant
roundtrips, +-1 general roundtrips, marker walking, totality."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from llmap_spark.jpeg import decode_jpeg, encode_jpeg


def test_constant_grayscale_roundtrips_exactly():
    """All-ones quant + DC-only spectrum: constant images are LOSSLESS
    through the full Huffman/DCT pipeline — the planted-oracle property."""
    for v in (0, 17, 77, 128, 200, 255):
        for w, h in ((8, 8), (5, 3), (17, 9), (32, 24), (1, 1)):
            px = bytes([v]) * (w * h)
            img = decode_jpeg(encode_jpeg(px, w, h, 1))
            assert img.status == "ok"
            assert (img.width, img.height, img.channels) == (w, h, 1)
            assert img.pixels == px, (v, w, h)


def test_arbitrary_grayscale_within_one():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=24 * 16, dtype=np.uint8)
    img = decode_jpeg(encode_jpeg(px.tobytes(), 24, 16, 1))
    got = np.frombuffer(img.pixels, dtype=np.uint8).astype(int)
    assert np.abs(got - px.astype(int)).max() <= 1


def test_color_roundtrip_small_tolerance():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=16 * 8 * 3, dtype=np.uint8)
    img = decode_jpeg(encode_jpeg(px.tobytes(), 16, 8, 3))
    assert (img.status, img.channels) == ("ok", 3)
    got = np.frombuffer(img.pixels, dtype=np.uint8).astype(int)
    # two lossy integer colorspace conversions bound the error
    assert np.abs(got - px.astype(int)).max() <= 3


def test_app_segments_and_header_only_files():
    from llmap_spark.media_meta import make_jpeg

    base = encode_jpeg(bytes([120]) * 64, 8, 8, 1)
    # splice an APP0/JFIF segment after SOI: decode walks over it
    app0 = (b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00"
            + b"\x01\x01\x00" + b"\x00\x01\x00\x01" + b"\x00\x00")
    spliced = base[:2] + app0 + base[2:]
    assert decode_jpeg(spliced).pixels == bytes([120]) * 64
    # media_meta's header-only generator has no scan data: typed status
    assert decode_jpeg(make_jpeg(10, 10)).status == "truncated"


def test_unsupported_variants_typed():
    base = bytearray(encode_jpeg(bytes([50]) * 64, 8, 8, 1))
    # flip SOF0 -> SOF2 (progressive)
    i = bytes(base).find(b"\xff\xc0")
    base[i + 1] = 0xC2
    assert decode_jpeg(bytes(base)).status == "unsupported_progressive"


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=300))
def test_total_on_arbitrary_bytes(data):
    for prefix in (b"", b"\xff\xd8", b"\xff\xd8\xff\xdb"):
        r = decode_jpeg(prefix + data)
        assert isinstance(r.status, str)
        assert decode_jpeg(prefix + data) == r


def test_truncated_scan_never_raises():
    full = encode_jpeg(bytes(range(64)), 8, 8, 1)
    for cut in range(0, len(full), 5):
        r = decode_jpeg(full[:cut])
        assert isinstance(r.status, str)


def test_cross_codec_consistency():
    """The same constant image encoded as PNG, GIF, and JPEG must decode
    to identical pixel stats through image_pixel_stats — the three
    codecs share one mean/md5 definition (png.pixel_stats_of) and the
    constant-content paths are all lossless."""
    from llmap_spark.functions.multimodal import image_pixel_stats
    from llmap_spark.gif import encode_gif
    from llmap_spark.png import encode_png

    w, h, v = 12, 9, 77
    grey = bytes([v]) * (w * h)
    png_stats = image_pixel_stats(encode_png(grey, w, h, 1))
    jpg_stats = image_pixel_stats(encode_jpeg(grey, w, h, 1))
    assert png_stats == jpg_stats == ("ok", w, h, 1, v * 1000,
                                      png_stats[5])
    # GIF is palette RGB: same mean per the constant (v,v,v) palette
    pal = bytes([v, v, v, 0, 0, 0])
    gif_stats = image_pixel_stats(encode_gif(bytes(w * h), w, h, pal))
    assert gif_stats[:3] == ("ok", w, h)
    assert gif_stats[4] == v * 1000
