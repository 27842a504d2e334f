"""Real PNG codec (llmap_spark.png): roundtrips, every scanline filter,
palette expansion, bounded inflate, totality, and the Spark decode op."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
from hypothesis import given, settings, strategies as st

from llmap_spark.png import (_SIG, decode_png, encode_png, png_pixel_stats,
                             resample_nearest)


def _chunk(t: bytes, d: bytes) -> bytes:
    return (struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))


def _fwd_filter(recon: bytes, h: int, stride: int, bpp: int,
                ftypes: list[int]) -> bytes:
    """Forward scanline filtering per the PNG spec — the independent
    reference the decoder's unfilter is checked against."""
    out = b""
    prev = [0] * stride
    for y in range(h):
        row = recon[y * stride:(y + 1) * stride]
        ft = ftypes[y % len(ftypes)]
        line = []
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
            line.append((row[x] - pred) & 0xFF)
        out += bytes([ft]) + bytes(line)
        prev = list(row)
    return out


def test_encode_decode_roundtrip_all_channel_counts():
    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):
        for w, h in ((1, 1), (5, 3), (33, 17)):
            px = rng.randint(0, 256, size=h * w * ch,
                             dtype=np.uint8).tobytes()
            img = decode_png(encode_png(px, w, h, ch))
            assert img.status == "ok"
            assert (img.width, img.height, img.channels) == (w, h, ch)
            assert img.pixels == px


def test_all_five_filters_unfilter_exactly():
    """Hand-built PNG whose rows cycle filters 0-4, forward-filtered by
    the independent spec reference above: the decoder must reconstruct
    the original bytes exactly."""
    rng = np.random.RandomState(11)
    w, h, ch = 9, 10, 3
    recon = bytes(rng.randint(0, 256, size=h * w * ch, dtype=np.uint8))
    raw = _fwd_filter(recon, h, w * ch, ch, [0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    img = decode_png(png)
    assert img.status == "ok" and img.pixels == recon


def test_palette_expands_to_rgb():
    plte = bytes(range(30))  # 10 entries
    idx = bytes([0, 3, 9, 5, 2, 7] * 4)
    raw = b"".join(b"\x00" + idx[y * 6:(y + 1) * 6] for y in range(4))
    ihdr = struct.pack(">IIBBBBB", 6, 4, 8, 3, 0, 0, 0)
    png = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    img = decode_png(png)
    assert (img.status, img.channels) == ("ok", 3)
    assert img.pixels == b"".join(plte[3 * i:3 * i + 3] for i in idx)
    # out-of-range palette index clamps (total), never raises
    bad_idx = b"".join(b"\x00" + bytes([250] * 6) for _ in range(4))
    png2 = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
            + _chunk(b"IDAT", zlib.compress(bad_idx)) + _chunk(b"IEND", b""))
    assert decode_png(png2).status == "ok"


def test_multi_idat_and_crc_tolerance():
    """IDAT split across chunks concatenates; bad CRCs are tolerated
    (web reality: truncated-then-repaired files)."""
    px = bytes(range(240)) * 2
    full = encode_png(px, 20, 8, 3)
    # re-split the IDAT into two chunks
    img0 = decode_png(full)
    raw = zlib.compress(b"".join(
        b"\x00" + px[y * 60:(y + 1) * 60] for y in range(8)))
    ihdr = struct.pack(">IIBBBBB", 20, 8, 8, 2, 0, 0, 0)
    split = (_SIG + _chunk(b"IHDR", ihdr)
             + _chunk(b"IDAT", raw[:10]) + _chunk(b"IDAT", raw[10:])
             + _chunk(b"IEND", b""))
    img1 = decode_png(split)
    assert img0.pixels == img1.pixels == px
    # corrupt a CRC byte: decode still works (CRCs are skipped)
    broken = bytearray(full)
    broken[-5] ^= 0xFF
    assert decode_png(bytes(broken)).pixels == px


def test_bounded_inflate_zip_bomb():
    """An IDAT that inflates far past width*height stops at the expected
    byte count — the decoder never materializes the bomb."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * 50_000_000)
    png = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", bomb)
           + _chunk(b"IEND", b""))
    img = decode_png(png)
    assert img.status == "ok" and len(img.pixels) == 4


def test_unsupported_variants_typed_statuses():
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    png16 = _SIG + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b"")
    assert decode_png(png16).status == "unsupported_depth"
    ihdr_i = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    png_i = _SIG + _chunk(b"IHDR", ihdr_i) + _chunk(b"IEND", b"")
    assert decode_png(png_i).status == "unsupported_interlaced"
    huge = struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 0, 0, 0, 0)
    assert decode_png(
        _SIG + _chunk(b"IHDR", huge) + _chunk(b"IEND", b"")
    ).status == "unsupported_size"


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=200))
def test_total_on_arbitrary_bytes(data):
    for prefix in (b"", _SIG):
        r = decode_png(prefix + data)
        assert isinstance(r.status, str)
        # determinism
        assert decode_png(prefix + data) == r


def test_resample_nearest_properties():
    px = bytes([77]) * 80
    assert resample_nearest(px, 10, 8, 1, 4, 3) == bytes([77]) * 12
    # identity resample
    rng = np.random.RandomState(3)
    p = rng.randint(0, 256, size=6 * 4 * 3, dtype=np.uint8).tobytes()
    assert resample_nearest(p, 6, 4, 3, 6, 4) == p
    # upscale duplicates deterministically
    up = resample_nearest(bytes([1, 2]), 2, 1, 1, 4, 1)
    assert up == bytes([1, 1, 2, 2])


def test_real_resize_roundtrip():
    from llmap_spark.functions.multimodal import resize_image

    px = bytes([200]) * (16 * 12)
    out = resize_image(encode_png(px, 16, 12, 1), 8, 6)
    img = decode_png(out)
    assert (img.status, img.width, img.height) == ("ok", 8, 6)
    assert img.pixels == bytes([200]) * 48


def test_spark_png_decode_op(spark):
    from llmap_spark.functions.multimodal import with_png_decode

    rows = [(0, encode_png(bytes([50]) * 12, 4, 3, 1)),
            (1, encode_png(bytes([10, 20, 30]) * 8, 4, 2, 3)),
            (2, b"\xff\xd8\xffnot a png"),
            (3, None)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in
           with_png_decode(df, "payload", keep_cols=("id",)).collect()}
    assert (out[0].status, out[0].width, out[0].height,
            out[0].channels) == ("ok", 4, 3, 1)
    assert out[0].mean_x1000 == 50_000
    assert out[0].px_md5 == hashlib.md5(bytes([50]) * 12).hexdigest()
    assert out[1].mean_x1000 == 20_000  # (10+20+30)/3 exactly
    assert out[2].status == "not_png" and out[2].px_md5 is None
    assert out[3].status == "not_png"
    # same kernel as the single-process path (no-fork rule)
    assert png_pixel_stats(rows[0][1])[4] == 50_000


def test_hostile_ihdr_dims_stay_int32_safe(spark):
    """IHDR dims beyond int32 must come back NULL in the typed failure
    row, not crash the Arrow serializer (review finding)."""
    from llmap_spark.functions.multimodal import with_png_decode

    ihdr = struct.pack(">IIBBBBB", 0xF0000000, 7, 8, 0, 0, 0, 0)
    png = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    img = decode_png(png)
    assert img.status == "unsupported_size"
    assert img.width is None and img.height == 7
    df = spark.createDataFrame([(0, png)], "id long, payload binary")
    rows = with_png_decode(df, "payload", keep_cols=("id",)).collect()
    assert rows[0].status == "unsupported_size" and rows[0].width is None
