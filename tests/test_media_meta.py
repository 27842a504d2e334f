"""Media header metadata kernel: generator/parser roundtrips, totality,
and the Spark wrapper's carry/determinism contract."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings, strategies as st

from llmap_spark import media_meta as mm


@pytest.mark.parametrize("w,h,d", [(1, 1, 1), (16, 16, 8), (640, 480, 16),
                                   (65535, 1, 2)])
def test_png_roundtrip(w, h, d):
    got = mm.parse_media_meta(mm.make_png(w, h, d))
    assert got == ("image/png", w, h, d, None, None, None, None)


def test_png_is_fully_valid():
    """make_png claims full validity: IDAT must inflate to the exact
    scanline byte count and every chunk CRC must check."""
    b = mm.make_png(20, 7, 8)
    i = 8
    while i < len(b):
        ln = int.from_bytes(b[i:i + 4], "big")
        ctype = b[i + 4:i + 8]
        data = b[i + 8:i + 8 + ln]
        crc = int.from_bytes(b[i + 8 + ln:i + 12 + ln], "big")
        assert crc == zlib.crc32(ctype + data) & 0xFFFFFFFF
        if ctype == b"IDAT":
            assert len(zlib.decompress(data)) == 7 * (1 + 20)
        i += 12 + ln
    assert b.endswith(mm._png_chunk(b"IEND", b""))


@pytest.mark.parametrize("w,h,d", [(1, 1, 1), (99, 77, 5), (65535, 65535, 8)])
def test_gif_roundtrip(w, h, d):
    assert mm.parse_media_meta(mm.make_gif(w, h, d)) == (
        "image/gif", w, h, d, None, None, None, None)


@pytest.mark.parametrize("w,h,p", [(1, 1, 8), (1024, 768, 8), (400, 300, 12)])
def test_jpeg_roundtrip(w, h, p):
    assert mm.parse_media_meta(mm.make_jpeg(w, h, p)) == (
        "image/jpeg", w, h, p, None, None, None, None)


@pytest.mark.parametrize("sr,ch,bits", [(8000, 1, 8), (44100, 2, 16),
                                        (48000, 2, 24)])
def test_wav_roundtrip(sr, ch, bits):
    assert mm.parse_media_meta(mm.make_wav(sr, ch, bits)) == (
        "audio/wav", None, None, bits, sr, ch, None, None)


def test_corrupt_headers_give_nulls_not_exceptions():
    assert mm.parse_media_meta(None) == mm._NULL
    assert mm.parse_media_meta(b"") == mm._NULL
    assert mm.parse_media_meta(b"\x00" * 40) == mm._NULL
    # right magic, truncated body: kind survives, dims null
    assert mm.parse_media_meta(b"\x89PNG\r\n\x1a\n\x00\x00") == (
        "image/png", None, None, None, None, None, None, None)
    assert mm.parse_media_meta(b"GIF89a\x01") == (
        "image/gif", None, None, None, None, None, None, None)
    assert mm.parse_media_meta(b"\xff\xd8\xff\xff") == (
        "image/jpeg", None, None, None, None, None, None, None)
    assert mm.parse_media_meta(b"RIFF\x00\x00\x00\x00WAVEjunk") == (
        "audio/wav", None, None, None, None, None, None, None)


def test_jpeg_skips_leading_segments():
    # APP0 + COM before SOF0 must be walked over, not break the scan
    com = b"\xff\xfe" + (5).to_bytes(2, "big") + b"abc"
    b = mm.make_jpeg(55, 44, 8)
    with_com = b[:2] + com + b[2:]
    assert mm.parse_media_meta(with_com) == ("image/jpeg", 55, 44, 8, None, None, None, None)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=128))
def test_total_on_arbitrary_bytes(data):
    for prefix in (b"", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"\xff\xd8\xff",
                   b"RIFF\x10\x00\x00\x00WAVE"):
        r = mm.parse_media_meta(prefix + data)
        assert isinstance(r, mm.MediaMeta)


def test_spark_wrapper_carries_and_is_deterministic(spark):
    rows = [(1, mm.make_png(10, 20, 8)), (2, mm.make_gif(5, 6, 3)),
            (3, mm.make_jpeg(7, 8, 8)), (4, mm.make_wav(16000, 1, 16)),
            (5, None), (6, b"\x00garbage")]
    df = spark.createDataFrame(rows, "id long, payload binary")
    def tup(r):
        return (r.kind, r.width, r.height, r.bit_depth, r.sample_rate,
                r.channels, r.duration_ms)

    out = {r.id: tup(r)
           for r in mm.with_media_meta(df, "payload", keep_cols=("id",)).collect()}
    assert out[1] == ("image/png", 10, 20, 8, None, None, None)
    assert out[2] == ("image/gif", 5, 6, 3, None, None, None)
    assert out[3] == ("image/jpeg", 7, 8, 8, None, None, None)
    assert out[4] == ("audio/wav", None, None, 16, 16000, 1, None)
    assert out[5] == (None,) * 7
    assert out[6] == (None,) * 7
    out2 = {r.id: tup(r)
            for r in mm.with_media_meta(df, "payload", keep_cols=("id",)).collect()}
    assert out == out2


def test_jpeg_fill_bytes_before_markers():
    # markers may be padded with any number of 0xFF fill bytes
    b = mm.make_jpeg(640, 480)
    padded = b[:2] + b"\xff\xff\xff" + b[2:]
    assert mm.parse_media_meta(padded) == ("image/jpeg", 640, 480, 8, None, None, None, None)


@pytest.mark.parametrize("w,h,ms", [(1, 1, 1), (640, 360, 12345),
                                    (1920, 1080, 2**31 - 1), (16, 9, 0)])
def test_mp4_roundtrip(w, h, ms):
    assert mm.parse_media_meta(mm.make_mp4(w, h, ms)) == (
        "video/mp4", w, h, None, None, None, ms, None)


def test_mp4_version1_and_largesize_boxes():
    """Parser handles mvhd/tkhd version 1 (64-bit times) and the 64-bit
    largesize box framing the generator never emits."""
    import struct

    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    mvhd1 = (b"\x01\x00\x00\x00" + b"\x00" * 16        # v1 + 64-bit times
             + struct.pack(">I", 90000)                 # timescale
             + struct.pack(">Q", 90000 * 7))            # duration (7 s)
    tkhd1 = (b"\x01\x00\x00\x07" + b"\x00" * 84         # v1 layout: dims at 88
             + struct.pack(">II", 320 << 16, 240 << 16))
    moov = box(b"moov", box(b"mvhd", mvhd1) + box(b"trak", box(b"tkhd", tkhd1)))
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00")
    got = mm.parse_media_meta(ftyp + moov)
    assert got == ("video/mp4", 320, 240, None, None, None, 7000, None)
    # 64-bit largesize framing of moov: size field 1 + 8-byte size
    large_moov = (struct.pack(">I", 1) + b"moov"
                  + struct.pack(">Q", 16 + len(moov) - 8) + moov[8:])
    assert mm.parse_media_meta(ftyp + large_moov) == got


def test_mp4_totality_on_garbage():
    assert mm.parse_media_meta(b"\x00\x00\x00\x0cftypisom") == (
        "video/mp4", None, None, None, None, None, None, None)
    # 8-byte input is below the 12-byte sniff minimum: unrecognized
    assert mm.parse_media_meta(b"\x00\x00\x00\x08ftyp") == (None,) * 8
    trunc = mm.make_mp4(64, 64, 5000)[:40]
    got = mm.parse_media_meta(trunc)
    assert got.kind == "video/mp4"  # never raises on truncation


def test_resize_plan_shapes_and_totality(spark):
    """with_resize_plan: real header dims, integer fit arithmetic, never
    upscales, total on null/garbage, deterministic fake payload."""
    from llmap_spark.functions.multimodal import with_resize_plan

    rows = [(1, mm.make_png(200, 100, 8)),   # downscale, width-bound
            (2, mm.make_png(10, 10, 8)),     # smaller than box: no-op
            (3, None),
            (4, b"\x00garbage"),
            (5, mm.make_mp4(640, 360, 1000))]  # video dims resize too
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in with_resize_plan(
        df, "payload", max_w=64, max_h=48, keep_cols=("id",)).collect()}
    assert len(out) == 5  # one row per input row, always
    r1 = out[1]
    assert (r1.orig_w, r1.orig_h) == (200, 100)
    assert r1.scale_x1000 == min(1000, 64000 // 200, 48000 // 100) == 320
    assert (r1.out_w, r1.out_h) == (64, 32)
    assert r1.resized_len == len(rows[0][1]) * 320 // 1000
    r2 = out[2]
    assert r2.scale_x1000 == 1000 and (r2.out_w, r2.out_h) == (10, 10)
    assert bytes(r2.resized) == rows[1][1]  # no-op scale keeps all bytes
    for i in (3, 4):
        assert out[i].orig_w is None and out[i].resized is None
    assert (out[5].out_w, out[5].out_h) == (64, 36)


@pytest.mark.parametrize("sr,ch,bits,total", [(44100, 2, 16, 44100),
                                              (48000, 1, 24, 96000),
                                              (8000, 8, 32, 1)])
def test_flac_roundtrip(sr, ch, bits, total):
    got = mm.parse_media_meta(mm.make_flac(sr, ch, bits, total))
    assert got == ("audio/flac", None, None, bits, sr, ch,
                   total * 1000 // sr, None)


def test_mp3_roundtrip_and_duration_estimate():
    got = mm.parse_media_meta(mm.make_mp3(1, 14, 8000, mono=True))
    # idx 1 -> 48000 Hz, idx 14 -> 320 kbps; 8000 audio bytes
    assert got == ("audio/mpeg", None, None, None, 48000, 1,
                   8000 * 8 // 320, None)
    # bare frame without ID3 tag also sniffs
    bare = mm.make_mp3(0, 9, 100)[10:]
    assert mm.parse_media_meta(bare).sample_rate == 44100


def test_flac_mp3_totality():
    assert mm.parse_media_meta(b"fLaC") == (
        "audio/flac", None, None, None, None, None, None, None)
    assert mm.parse_media_meta(b"ID3" + b"\x00" * 7) == (
        "audio/mpeg", None, None, None, None, None, None, None)
    # free-format bitrate (idx 0) and reserved rate give nulls, not junk
    weird = mm.make_mp3(0, 0, 100)
    assert mm.parse_media_meta(weird).duration_ms is None


@given(st.integers(1, 16383), st.integers(1, 16383),
       st.sampled_from(["vp8", "vp8l", "vp8x"]))
@settings(max_examples=60, deadline=None)
def test_webp_roundtrip(w, h, variant):
    got = mm.parse_media_meta(mm.make_webp(w, h, variant))
    assert (got.kind, got.width, got.height, got.bit_depth) == (
        "image/webp", w, h, 8)
    assert got.orientation is None


def test_webp_vp8x_24bit_canvas():
    got = mm.parse_media_meta(mm.make_webp(100_000, 70_000, "vp8x"))
    assert (got.width, got.height) == (100_000, 70_000)


@given(st.integers(1, 65535), st.integers(1, 65535),
       st.sampled_from([1, 8, 16]), st.integers(1, 8), st.booleans())
@settings(max_examples=60, deadline=None)
def test_tiff_roundtrip(w, h, bits, orient, le):
    got = mm.parse_media_meta(mm.make_tiff(w, h, bits, orient, le))
    assert (got.kind, got.width, got.height, got.bit_depth,
            got.orientation) == ("image/tiff", w, h, bits, orient)


def test_tiff_offset_stored_bits_per_sample():
    """A 3-channel BitsPerSample (count>1 -> offset-stored SHORT array)
    reads its first element, the common RGB shape."""
    e = "little"
    def short_entry(tag, typ, cnt, val4):
        return (tag.to_bytes(2, e) + typ.to_bytes(2, e)
                + cnt.to_bytes(4, e) + val4)
    # IFD at 8 with 2 entries; bits array appears after the IFD
    bits_off = 8 + 2 + 2 * 12 + 4
    ifd = ((2).to_bytes(2, e)
           + short_entry(256, 3, 1, (640).to_bytes(2, e) + b"\x00\x00")
           + short_entry(258, 3, 3, bits_off.to_bytes(4, e))
           + (0).to_bytes(4, e))
    data = (b"II*\x00" + (8).to_bytes(4, e) + ifd
            + (8).to_bytes(2, e) * 3)
    got = mm.parse_media_meta(data)
    assert (got.kind, got.width, got.bit_depth) == ("image/tiff", 640, 8)


def test_jpeg_exif_orientation_roundtrip():
    for orient in range(1, 9):
        got = mm.parse_media_meta(mm.make_jpeg_exif(320, 240, orient))
        assert (got.kind, got.width, got.height, got.orientation) == (
            "image/jpeg", 320, 240, orient)
    # plain JPEG keeps a NULL orientation
    assert mm.parse_media_meta(mm.make_jpeg(320, 240)).orientation is None


def test_new_legs_total_on_truncation():
    for maker in (lambda: mm.make_webp(99, 77, "vp8"),
                  lambda: mm.make_webp(99, 77, "vp8l"),
                  lambda: mm.make_tiff(99, 77),
                  lambda: mm.make_jpeg_exif(99, 77, 5)):
        full = maker()
        for cut in range(0, len(full), 3):
            mm.parse_media_meta(full[:cut])  # must not raise
        mm.parse_media_meta(full + b"\x00" * 7)
