"""Stdlib-only media header metadata: PNG / GIF / JPEG / WebP
(VP8|VP8L|VP8X) / TIFF dimensions + bit depth + EXIF orientation,
WAV / FLAC / MP3 sample rate / channels / bits, MP4 (ISO-BMFF) track
dimensions + duration — parsed from container headers, no codec library.

Replaces the round-1 byte-histogram stand-in as the *metadata* half of the
multimodal story: full pixel/sample decode still needs codec libs (the
`decode_image` seam in functions/multimodal.py), but the typed metadata a
100 TB pipeline actually filters on (kind, dimensions, depth, sample rate)
is reachable from the first dozens of bytes. All integer-exact, so the
driver can verify the parse against a planted-value SQL oracle.

Total: any byte input returns a row of nulls rather than raising (the same
never-throw rule as the HTML and PDF kernels). Matching deterministic
generators (make_png / make_gif / make_jpeg / make_wav) produce minimal
well-formed files for tests and the driver roundtrip query; make_png emits
a fully valid file (correct CRCs, decodable IDAT), the others emit the
minimal header + trailer framing their formats require.
"""

from __future__ import annotations

import struct
import zlib
from typing import NamedTuple

MEDIA_META_SCHEMA = ("kind string, width int, height int, bit_depth int, "
                     "sample_rate int, channels int, duration_ms int, "
                     "orientation int")

# JPEG start-of-frame markers (C0-CF minus DHT C4, JPG C8, DAC CC)
_SOF_MARKERS = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}
_STANDALONE = {0x01, 0xD8} | set(range(0xD0, 0xDA))  # no length field


class MediaMeta(NamedTuple):
    kind: str | None
    width: int | None
    height: int | None
    bit_depth: int | None
    sample_rate: int | None
    channels: int | None
    duration_ms: int | None
    # EXIF/TIFF tag 274 (1..8); defaulted so the audio/video legs'
    # positional constructions stay valid — only TIFF and JPEG-with-EXIF
    # populate it
    orientation: int | None = None


_NULL = MediaMeta(None, None, None, None, None, None, None)


def _png(b: bytes) -> MediaMeta:
    if len(b) < 26 or b[12:16] != b"IHDR":
        return MediaMeta("image/png", None, None, None, None, None, None)
    w = int.from_bytes(b[16:20], "big")
    h = int.from_bytes(b[20:24], "big")
    return MediaMeta("image/png", w, h, b[24], None, None, None)


def _gif(b: bytes) -> MediaMeta:
    if len(b) < 11:
        return MediaMeta("image/gif", None, None, None, None, None, None)
    w = int.from_bytes(b[6:8], "little")
    h = int.from_bytes(b[8:10], "little")
    depth = (b[10] & 0x07) + 1  # global color table size exponent
    return MediaMeta("image/gif", w, h, depth, None, None, None)


def _tiff_tags(t: bytes) -> dict[int, int]:
    """First-IFD tag values of a TIFF byte stream (both endiannesses).
    Handles inline SHORT/LONG/BYTE values and offset-stored SHORT arrays
    (BitsPerSample per-channel lists — first element taken). Total:
    malformed offsets/counts stop the walk with what was read."""
    if len(t) < 8:
        return {}
    if t[:4] == b"II*\x00":
        e = "little"
    elif t[:4] == b"MM\x00*":
        e = "big"
    else:
        return {}
    out: dict[int, int] = {}
    off = int.from_bytes(t[4:8], e)
    if off + 2 > len(t):
        return out
    n = int.from_bytes(t[off:off + 2], e)
    for i in range(min(n, 256)):
        p = off + 2 + 12 * i
        if p + 12 > len(t):
            break
        tag = int.from_bytes(t[p:p + 2], e)
        typ = int.from_bytes(t[p + 2:p + 4], e)
        cnt = int.from_bytes(t[p + 4:p + 8], e)
        if typ == 3:  # SHORT: left-justified inline when it fits
            if cnt == 1:
                out[tag] = int.from_bytes(t[p + 8:p + 10], e)
            else:
                voff = int.from_bytes(t[p + 8:p + 12], e)
                if voff + 2 <= len(t):
                    out[tag] = int.from_bytes(t[voff:voff + 2], e)
        elif typ == 4 and cnt == 1:  # LONG
            out[tag] = int.from_bytes(t[p + 8:p + 12], e)
        elif typ == 1 and cnt == 1:  # BYTE
            out[tag] = t[p + 8]
    return out


def _tiff(b: bytes) -> MediaMeta:
    tags = _tiff_tags(b)
    return MediaMeta("image/tiff", tags.get(256), tags.get(257),
                     tags.get(258), None, None, None, tags.get(274))


def _jpeg(b: bytes) -> MediaMeta:
    i, n = 2, len(b)
    orientation = None
    while i + 1 < n:
        if b[i] != 0xFF:
            break
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte: markers may be padded with 0xFF
            i += 1
            continue
        if marker in _STANDALONE:
            i += 2
            continue
        if i + 4 > n:
            break
        seg_len = int.from_bytes(b[i + 2:i + 4], "big")
        if (marker == 0xE1 and seg_len >= 8
                and b[i + 4:i + 10] == b"Exif\x00\x00"):
            # APP1/Exif: a TIFF stream whose IFD offsets are relative to
            # its own start — slice it out and reuse the TIFF walker
            orientation = _tiff_tags(
                b[i + 10:i + 2 + seg_len]).get(274, orientation)
        if marker in _SOF_MARKERS:
            if i + 9 > n:
                break
            precision = b[i + 4]
            h = int.from_bytes(b[i + 5:i + 7], "big")
            w = int.from_bytes(b[i + 7:i + 9], "big")
            return MediaMeta("image/jpeg", w, h, precision, None, None,
                             None, orientation)
        if seg_len < 2:
            break
        i += 2 + seg_len
    return MediaMeta("image/jpeg", None, None, None, None, None, None,
                     orientation)


def _webp(b: bytes) -> MediaMeta:
    """RIFF/WEBP: dimensions from the first VP8 (lossy key-frame
    header), VP8L (lossless signature bits) or VP8X (extended canvas)
    chunk. WebP is 8-bit-per-channel by format, so bit_depth is 8
    whenever dimensions parse."""
    i, n = 12, len(b)
    while i + 8 <= n:
        cid = b[i:i + 4]
        size = int.from_bytes(b[i + 4:i + 8], "little")
        p = b[i + 8:i + 8 + size]
        if cid == b"VP8 " and len(p) >= 10 and p[3:6] == b"\x9d\x01\x2a":
            w = int.from_bytes(p[6:8], "little") & 0x3FFF
            h = int.from_bytes(p[8:10], "little") & 0x3FFF
            return MediaMeta("image/webp", w, h, 8, None, None, None)
        if cid == b"VP8L" and len(p) >= 5 and p[0] == 0x2F:
            bits = int.from_bytes(p[1:5], "little")
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return MediaMeta("image/webp", w, h, 8, None, None, None)
        if cid == b"VP8X" and len(p) >= 10:
            w = int.from_bytes(p[4:7], "little") + 1
            h = int.from_bytes(p[7:10], "little") + 1
            return MediaMeta("image/webp", w, h, 8, None, None, None)
        i += 8 + size + (size & 1)  # chunks are word-aligned
    return MediaMeta("image/webp", None, None, None, None, None, None)


def _wav(b: bytes) -> MediaMeta:
    # walk RIFF chunks for 'fmt '
    i, n = 12, len(b)
    while i + 8 <= n:
        cid = b[i:i + 4]
        size = int.from_bytes(b[i + 4:i + 8], "little")
        if cid == b"fmt " and i + 8 + 16 <= n:
            ch = int.from_bytes(b[i + 10:i + 12], "little")
            sr = int.from_bytes(b[i + 12:i + 16], "little")
            bits = int.from_bytes(b[i + 22:i + 24], "little")
            return MediaMeta("audio/wav", None, None, bits, sr, ch, None)
        i += 8 + size + (size & 1)  # chunks are word-aligned
    return MediaMeta("audio/wav", None, None, None, None, None, None)


def _boxes(b: bytes, start: int, end: int):
    """Iterate ISO-BMFF boxes in b[start:end] as (type, payload_start,
    payload_end). Handles 64-bit largesize (size==1) and to-EOF (size==0);
    bails on any malformed size (total)."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(b[i:i + 4], "big")
        typ = b[i + 4:i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            size = int.from_bytes(b[i + 8:i + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr:
            return
        yield typ, i + hdr, min(i + size, end)
        i += size


def _mp4(b: bytes) -> MediaMeta:
    """moov/mvhd -> duration_ms (timescale-normalized); first trak/tkhd
    with nonzero 16.16-fixed dimensions -> width/height (the video track;
    audio tracks carry zero dims)."""
    dur = ts = w = h = None
    for typ, s, e in _boxes(b, 0, len(b)):
        if typ != b"moov":
            continue
        for t2, s2, e2 in _boxes(b, s, e):
            if t2 == b"mvhd" and e2 - s2 >= 20:
                if b[s2] == 1 and e2 - s2 >= 32:  # version 1: 64-bit times
                    ts = int.from_bytes(b[s2 + 20:s2 + 24], "big")
                    dur = int.from_bytes(b[s2 + 24:s2 + 32], "big")
                else:
                    ts = int.from_bytes(b[s2 + 12:s2 + 16], "big")
                    dur = int.from_bytes(b[s2 + 16:s2 + 20], "big")
            elif t2 == b"trak" and w is None:
                for t3, s3, e3 in _boxes(b, s2, e2):
                    if t3 == b"tkhd":
                        off = s3 + (88 if b[s3] == 1 else 76)
                        if off + 8 <= e3:
                            tw = int.from_bytes(b[off:off + 4], "big") >> 16
                            th = int.from_bytes(b[off + 4:off + 8], "big") >> 16
                            if tw and th:
                                w, h = tw, th
        break
    dur_ms = (dur * 1000) // ts if dur is not None and ts else None
    if dur_ms is not None and dur_ms > 0x7FFFFFFF:
        dur_ms = None  # would overflow the int column; treat as unknown
    return MediaMeta("video/mp4", w, h, None, None, None, dur_ms)


def _flac(b: bytes) -> MediaMeta:
    """STREAMINFO (mandatory first metadata block): sample rate (20 bits),
    channels-1 (3), bits-1 (5), total samples (36) packed at byte 18 of
    the file; duration derives from total/rate."""
    if len(b) < 8 + 34 or (b[4] & 0x7F) != 0:
        return MediaMeta("audio/flac", None, None, None, None, None, None)
    info = b[8:8 + 34]
    packed = int.from_bytes(info[10:18], "big")
    rate = (packed >> 44) & 0xFFFFF
    channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & 0xFFFFFFFFF
    dur = (total * 1000) // rate if rate else None
    if dur is not None and dur > 0x7FFFFFFF:
        dur = None
    return MediaMeta("audio/flac", None, None, bits,
                     rate or None, channels, dur)


# MPEG1 Layer III tables (the common web case; indexes per the spec)
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                 160, 192, 224, 256, 320, 0)   # kbit/s
_MP3_RATES = (44100, 48000, 32000, 0)


def _mp3(b: bytes) -> MediaMeta:
    """First MPEG1-Layer-III frame header after an optional ID3v2 tag:
    bitrate/sample-rate/channels, plus a CBR duration estimate from the
    audio byte count (the standard header-only approximation)."""
    off = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21 | (b[7] & 0x7F) << 14
                | (b[8] & 0x7F) << 7 | (b[9] & 0x7F))
        off = 10 + size
    null = MediaMeta("audio/mpeg", None, None, None, None, None, None)
    if off + 4 > len(b):
        return null
    h = b[off:off + 4]
    if not (h[0] == 0xFF and (h[1] & 0xE0) == 0xE0):
        return null
    version = (h[1] >> 3) & 0x3   # 3 = MPEG1
    layer = (h[1] >> 1) & 0x3     # 1 = Layer III
    if version != 3 or layer != 1:
        return null  # only the common MPEG1 Layer III tables are carried
    bitrate = _MP3_BITRATES[(h[2] >> 4) & 0xF]
    rate = _MP3_RATES[(h[2] >> 2) & 0x3]
    channels = 1 if ((h[3] >> 6) & 0x3) == 3 else 2
    if not bitrate or not rate:
        return MediaMeta("audio/mpeg", None, None, None,
                         rate or None, channels, None)
    dur = ((len(b) - off) * 8) // bitrate  # bytes*8 / (kbit/s) = ms
    if dur > 0x7FFFFFFF:
        dur = None
    return MediaMeta("audio/mpeg", None, None, None, rate, channels, dur)


def parse_media_meta(payload: bytes | None) -> MediaMeta:
    """Header metadata by magic-byte dispatch. Total: unknown/short/corrupt
    payloads yield nulls (kind too, when the magic is unrecognized)."""
    if not payload or len(payload) < 4:
        return _NULL
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _png(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return _gif(payload)
        if payload[:3] == b"\xff\xd8\xff":
            return _jpeg(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _wav(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            return _webp(payload)
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            return _tiff(payload)
        if len(payload) >= 12 and payload[4:8] == b"ftyp":
            return _mp4(payload)
        if payload[:4] == b"fLaC":
            return _flac(payload)
        if payload[:3] == b"ID3" or (
                len(payload) >= 4 and payload[0] == 0xFF
                and (payload[1] & 0xE0) == 0xE0):
            return _mp3(payload)
    except Exception:
        return _NULL
    return _NULL


def with_media_meta(df, binary_col: str, keep_cols: tuple[str, ...] = ()):
    """Spark wrapper: header metadata per row via mapInPandas (Arrow
    batches; the payload never passes through row-at-a-time Python UDFs),
    carrying `keep_cols` through untouched."""
    import pandas as pd

    from llmap_spark.functions.arrow_carry import map_with_carry

    def batch(series: pd.Series) -> pd.DataFrame:
        metas = [parse_media_meta(v) for v in series]
        return pd.DataFrame(metas, columns=list(MediaMeta._fields))

    return map_with_carry(df, binary_col, keep_cols, MEDIA_META_SCHEMA, batch)


# ---------------------------------------------------------------------------
# deterministic generators (tests + driver roundtrip oracle)
# ---------------------------------------------------------------------------

def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def make_png(width: int, height: int, bit_depth: int = 8) -> bytes:
    """Fully valid grayscale PNG (correct CRCs, decodable zero IDAT)."""
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, 0, 0, 0, 0)
    row_bytes = (width * bit_depth + 7) // 8
    raw = (b"\x00" + b"\x00" * row_bytes) * height
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def make_gif(width: int, height: int, bit_depth: int = 8) -> bytes:
    packed = 0x80 | ((bit_depth - 1) & 0x07)  # GCT flag + table size
    gct = b"\x00" * (3 * (1 << bit_depth))
    return (b"GIF89a" + struct.pack("<HH", width, height)
            + bytes([packed, 0, 0]) + gct + b";")


def make_jpeg(width: int, height: int, precision: int = 8) -> bytes:
    app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    sof0 = (b"\xff\xc0" + struct.pack(">HBHHB", 11, precision, height, width, 1)
            + b"\x01\x11\x00")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def wav_bytes(samples: bytes, sample_rate: int, channels: int = 1,
              bits: int = 16) -> bytes:
    """The ONE RIFF/WAVE (format 1) writer — stdlib-only so this module
    keeps its no-dependency kernel contract; llmap_spark.audio's
    encode_wav delegates here (audio.py needs numpy for stats, and
    importing it from make_wav would drag numpy into a header-only
    module)."""
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(samples)) + samples)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_wav(sample_rate: int, channels: int = 1, bits: int = 16,
             n_frames: int = 4) -> bytes:
    return wav_bytes(b"\x00" * (n_frames * channels * bits // 8),
                     sample_rate, channels, bits)


def make_mp4(width: int, height: int, duration_ms: int,
             timescale: int = 1000) -> bytes:
    """Minimal well-formed ISO-BMFF: ftyp + moov(mvhd + trak(tkhd)) with
    the planted duration and 16.16-fixed track dimensions. Deterministic."""
    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    dur = duration_ms * timescale // 1000
    mvhd = (b"\x00\x00\x00\x00"                       # version/flags
            + struct.pack(">II", 0, 0)                    # creation/modification
            + struct.pack(">II", timescale, dur)
            + struct.pack(">I", 0x00010000)               # rate 1.0
            + struct.pack(">H", 0x0100) + b"\x00" * 10   # volume + reserved
            + b"\x00" * 36 + b"\x00" * 24               # matrix + predefined
            + struct.pack(">I", 2))                       # next track id
    tkhd = (b"\x00\x00\x00\x07"                       # version/flags (enabled)
            + struct.pack(">IIII", 0, 0, 1, 0)            # times, track 1, rsvd
            + struct.pack(">I", dur) + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0)            # layer/alt/volume/rsvd
            + b"\x00" * 36                               # matrix
            + struct.pack(">II", width << 16, height << 16))
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    return ftyp + box(b"moov", box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd)))


def make_flac(sample_rate: int, channels: int = 2, bits: int = 16,
              total_samples: int = 44100) -> bytes:
    """Minimal FLAC: magic + last-block STREAMINFO with the planted
    stream parameters. Deterministic."""
    packed = ((sample_rate & 0xFFFFF) << 44
              | ((channels - 1) & 0x7) << 41
              | ((bits - 1) & 0x1F) << 36
              | (total_samples & 0xFFFFFFFFF))
    info = (struct.pack(">HH", 16, 16)          # min/max blocksize
            + b"\x00\x00\x00" * 2            # min/max framesize
            + packed.to_bytes(8, "big")
            + b"\x00" * 16)                    # md5 of samples (unset)
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + info


def make_mp3(sample_rate_idx: int = 0, bitrate_idx: int = 9,
             n_audio_bytes: int = 4000, mono: bool = False) -> bytes:
    """Minimal MP3: ID3v2 tag (empty) + one MPEG1-Layer-III frame header
    + zero audio bytes. Deterministic; duration estimate =
    n_audio_bytes*8 / bitrate_kbps ms."""
    id3 = b"ID3" + bytes([3, 0, 0, 0, 0, 0, 0])   # v2.3, no flags, size 0
    h1 = 0xFF
    h2 = 0xE0 | (3 << 3) | (1 << 1) | 1           # MPEG1, Layer III, no CRC
    h3 = (bitrate_idx << 4) | (sample_rate_idx << 2)
    h4 = (3 << 6) if mono else 0                  # mono vs stereo
    frame = bytes([h1, h2, h3, h4]) + b"\x00" * max(0, n_audio_bytes - 4)
    return id3 + frame


def make_webp(width: int, height: int, variant: str = "vp8") -> bytes:
    """Minimal RIFF/WEBP with the planted dimensions in a VP8 (lossy),
    VP8L (lossless) or VP8X (extended) chunk. Deterministic; dimensions
    must fit the format's field widths (14 bits for vp8/vp8l, 24 for
    vp8x)."""
    if variant == "vp8":
        cid = b"VP8 "
        p = (b"\x30\x01\x00" + b"\x9d\x01\x2a"
             + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF))
    elif variant == "vp8l":
        cid = b"VP8L"
        p = b"\x2f" + struct.pack(
            "<I", (width - 1) | ((height - 1) << 14))
    elif variant == "vp8x":
        cid = b"VP8X"
        p = (b"\x00" + b"\x00" * 3
             + (width - 1).to_bytes(3, "little")
             + (height - 1).to_bytes(3, "little"))
    else:
        raise ValueError(f"unknown webp variant {variant!r}")
    chunk = cid + struct.pack("<I", len(p)) + p
    if len(p) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _tiff_stream(width: int, height: int, bits: int, orientation: int,
                 little_endian: bool) -> bytes:
    e = "little" if little_endian else "big"

    def short_entry(tag: int, v: int) -> bytes:
        # SHORT count=1: value left-justified in the 4-byte field
        return (tag.to_bytes(2, e) + (3).to_bytes(2, e)
                + (1).to_bytes(4, e) + v.to_bytes(2, e) + b"\x00\x00")

    entries = (short_entry(256, width) + short_entry(257, height)
               + short_entry(258, bits) + short_entry(274, orientation))
    return ((b"II*\x00" if little_endian else b"MM\x00*")
            + (8).to_bytes(4, e)          # IFD at byte 8
            + (4).to_bytes(2, e) + entries
            + (0).to_bytes(4, e))         # no next IFD


def make_tiff(width: int, height: int, bits: int = 8, orientation: int = 1,
              little_endian: bool = True) -> bytes:
    """Minimal single-IFD TIFF (both byte orders) with planted
    ImageWidth/ImageLength/BitsPerSample/Orientation. Deterministic."""
    return _tiff_stream(width, height, bits, orientation, little_endian)


def make_jpeg_exif(width: int, height: int, orientation: int,
                   precision: int = 8) -> bytes:
    """make_jpeg plus an APP1/Exif segment carrying the planted TIFF
    orientation tag — the common crawl-photo shape."""
    tiff = _tiff_stream(width, height, 0, orientation, little_endian=False)
    exif = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(exif)) + exif
    base = make_jpeg(width, height, precision)
    return base[:2] + app1 + base[2:]
