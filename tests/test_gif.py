"""Real GIF codec (llmap_spark.gif): LZW roundtrips, interlace,
sub-canvas composition, totality, and the combined image-decode op."""

from __future__ import annotations

import hashlib

import numpy as np
from hypothesis import given, settings, strategies as st

from llmap_spark.gif import _INTERLACE_PASSES, decode_gif, encode_gif


def test_encode_decode_roundtrip_palette_sizes():
    rng = np.random.RandomState(5)
    for npal in (2, 4, 16, 256):
        pal = bytes(rng.randint(0, 256, size=3 * npal, dtype=np.uint8))
        for w, h in ((1, 1), (7, 5), (40, 31)):
            idx = bytes(rng.randint(0, npal, size=w * h, dtype=np.uint8))
            g = decode_gif(encode_gif(idx, w, h, pal))
            assert g.status == "ok"
            assert (g.width, g.height, g.channels) == (w, h, 3)
            assert g.pixels == b"".join(pal[3 * j:3 * j + 3] for j in idx)


def test_interlaced_frame_deinterlaces():
    """Hand-built interlaced GIF: rows stored in 4-pass order must come
    back in display order."""
    rng = np.random.RandomState(9)
    w, h = 5, 13
    pal = bytes(rng.randint(0, 256, size=3 * 4, dtype=np.uint8))
    idx = bytes(rng.randint(0, 4, size=w * h, dtype=np.uint8))
    # store rows in interlace order, then flip the interlace flag
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, h, step)]
    stored = b"".join(idx[y * w:(y + 1) * w] for y in order)
    plain = encode_gif(stored, w, h, pal)
    # image descriptor starts after header(13) + GCT(3*4); flags byte is
    # descriptor offset +9
    desc_off = 13 + 12
    assert plain[desc_off] == 0x2C
    interlaced = bytearray(plain)
    interlaced[desc_off + 9] |= 0x40
    g = decode_gif(bytes(interlaced))
    assert g.status == "ok"
    assert g.pixels == b"".join(pal[3 * j:3 * j + 3] for j in idx)


def test_subcanvas_frame_composes_on_background():
    """A frame smaller than the canvas lands at its offset; the rest of
    the canvas is the background color."""
    pal = bytes([10, 20, 30, 200, 210, 220])
    inner = encode_gif(bytes([1] * 4), 2, 2, pal)
    # rebuild with a 4x3 canvas, bg index 0, frame at (1,1)
    lsd = (b"GIF89a" + (4).to_bytes(2, "little") + (3).to_bytes(2, "little")
           + bytes([0x80, 0, 0]) + pal)
    desc_off = 13 + 6
    desc = (b"\x2c" + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
            + b"\x00")
    rest = inner[desc_off + 10:]  # min_code + blocks + trailer
    g = decode_gif(lsd + desc + rest)
    assert g.status == "ok" and (g.width, g.height) == (4, 3)
    bg, fg = pal[0:3], pal[3:6]
    rows = [g.pixels[y * 12:(y + 1) * 12] for y in range(3)]
    assert rows[0] == bg * 4
    assert rows[1] == bg + fg + fg + bg
    assert rows[2] == bg + fg + fg + bg


def test_extensions_are_skipped():
    pal = bytes(range(6))
    base = encode_gif(bytes([0, 1, 1, 0]), 2, 2, pal)
    # splice a graphic-control extension between header+GCT and the
    # image descriptor
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    cut = 13 + 6
    g = decode_gif(base[:cut] + gce + base[cut:])
    assert g.status == "ok"
    assert g.pixels == decode_gif(base).pixels


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=200))
def test_total_on_arbitrary_bytes(data):
    for prefix in (b"", b"GIF89a", b"GIF87a"):
        r = decode_gif(prefix + data)
        assert isinstance(r.status, str)
        assert decode_gif(prefix + data) == r


def test_decode_image_dispatches_gif():
    from llmap_spark.functions.multimodal import decode_image

    pal = bytes([40, 50, 60, 70, 80, 90])
    img = decode_image(encode_gif(bytes([0, 1, 0, 1]), 2, 2, pal))
    assert img.status == "ok" and img.channels == 3
    assert img.pixels == pal[0:3] + pal[3:6] + pal[0:3] + pal[3:6]


def test_spark_image_decode_op_png_and_gif(spark):
    from llmap_spark.functions.multimodal import with_image_decode
    from llmap_spark.png import encode_png

    pal = bytes([50, 51, 52, 0, 0, 0])
    from llmap_spark.jpeg import encode_jpeg

    rows = [(0, encode_png(bytes([70]) * 12, 4, 3, 1)),
            (1, encode_gif(bytes([0] * 6), 3, 2, pal)),
            (2, encode_jpeg(bytes([90]) * 24, 6, 4, 1)),
            (3, None),
            (4, b"RIFF\x10\x00\x00\x00WEBPjunk")]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in
           with_image_decode(df, "payload", keep_cols=("id",)).collect()}
    assert (out[0].status, out[0].mean_x1000) == ("ok", 70_000)
    assert (out[1].status, out[1].channels, out[1].mean_x1000) == (
        "ok", 3, 51_000)
    assert out[1].px_md5 == hashlib.md5(pal[0:3] * 6).hexdigest()
    assert (out[2].status, out[2].mean_x1000) == ("ok", 90_000)
    assert out[2].px_md5 == hashlib.md5(bytes([90]) * 24).hexdigest()
    assert out[3].status == "undecodable"
    assert out[4].status == "undecodable"  # the remaining WebP seam


def test_background_uses_global_table_not_local():
    """GIF89a defines the Background Color Index against the GLOBAL
    color table; a sub-canvas frame with a LOCAL table must not leak
    local colors into the background fill (review-found bug)."""
    gct = bytes([255, 0, 0, 0, 255, 0])          # red, green
    lct = bytes([0, 0, 255, 255, 255, 255])      # blue, white
    inner = encode_gif(bytes([1] * 4), 2, 2, lct)
    # rebuild: 4x3 canvas with GCT, bg index 0 (red), frame at (1,1)
    # with its own local table
    lsd = (b"GIF89a" + (4).to_bytes(2, "little") + (3).to_bytes(2, "little")
           + bytes([0x80, 0, 0]) + gct)
    desc = (b"\x2c" + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
            + bytes([0x80]))  # local color table flag, size 0 -> 2 entries
    inner_desc_off = 13 + 6
    rest = inner[inner_desc_off + 10:]  # min_code + blocks + trailer
    g = decode_gif(lsd + desc + lct + rest)
    assert g.status == "ok"
    red, white = gct[0:3], lct[3:6]
    rows = [g.pixels[y * 12:(y + 1) * 12] for y in range(3)]
    assert rows[0] == red * 4                      # background = GCT[0]
    assert rows[1] == red + white + white + red    # frame = LOCAL table
    assert rows[2] == red + white + white + red


def test_resize_image_gif_and_jpeg_reencode_png():
    """resize_image is real for every decodable format, normalizing the
    output to PNG (review finding: the docstring promised this but the
    implementation was PNG-only)."""
    from llmap_spark.functions.multimodal import resize_image
    from llmap_spark.jpeg import encode_jpeg
    from llmap_spark.png import decode_png

    pal = bytes([80, 80, 80, 0, 0, 0])
    out = resize_image(encode_gif(bytes(6 * 4), 6, 4, pal), 3, 2)
    img = decode_png(out)
    assert (img.status, img.width, img.height) == ("ok", 3, 2)
    assert img.pixels == bytes([80]) * 18
    out2 = resize_image(encode_jpeg(bytes([77]) * 48, 8, 6, 1), 4, 3)
    img2 = decode_png(out2)
    assert img2.pixels == bytes([77]) * 12
