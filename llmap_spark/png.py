"""REAL PNG pixel codec — stdlib zlib + numpy, no codec libraries.

Round 4's verdict called pixel decode "environment-blocked (no codec
libs)". That is true for JPEG/WebP (DCT/VP8 entropy coders), but PNG is
zlib + per-row byte filters, both fully available here — so the most
common lossless web image format gets a REAL decode / resample / encode
path, and `functions/multimodal.py`'s decode seam narrows to the
genuinely codec-bound formats.

Kernel discipline (llmap_spark.kernel rules): TOTAL — any byte input
returns a status row, never raises; deterministic; bounded — the
inflate is capped at the exact expected raw size (a zip-bomb IDAT
cannot expand past width*height arithmetic); and the SAME functions
serve the oracle CLI, pytest, and the Spark UDFs (no second
implementation to drift).

Supported: 8-bit greyscale (color type 0), truecolor RGB (2), palette
(3, expanded to RGB), grey+alpha (4) and RGBA (6), non-interlaced, all
five scanline filters (None/Sub/Up/Average/Paeth). 16-bit and Adam7
interlacing return a typed unsupported status (rare on the web and
adding them is mechanical, not architectural).

    decode_png(data)   -> PngImage(status, width, height, channels,
                          pixels bytes | None)   row-major, 8-bit
    encode_png(pixels, width, height, channels)  filter-0 rows, valid
                          CRCs — decode_png(encode_png(x)) == x
    resample_nearest(pixels, w, h, c, out_w, out_h) deterministic
                          integer nearest-neighbor
"""

from __future__ import annotations

import struct
import zlib
from typing import NamedTuple

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
MAX_PIXELS = 64_000_000  # 64 MP defensive cap (bounded-work rule)

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngImage(NamedTuple):
    status: str          # ok | not_png | truncated | unsupported_* | corrupt
    width: int | None
    height: int | None
    channels: int | None
    pixels: bytes | None  # h*w*channels bytes, row-major (palette -> RGB)


def _fail(status: str, w=None, h=None) -> PngImage:
    return PngImage(status, w, h, None, None)


def _chunks(b: bytes):
    i = 8
    n = len(b)
    while i + 8 <= n:
        ln = int.from_bytes(b[i:i + 4], "big")
        typ = b[i + 4:i + 8]
        data = b[i + 8:i + 8 + ln]
        if len(data) < ln:
            return  # truncated chunk: stop with what we have
        yield typ, data
        i += 12 + ln  # CRC skipped: tolerant decode (web reality)


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters. Rows arrive as (h, 1+stride);
    returns (h, stride) reconstructed bytes. Up is fully vectorized;
    Sub/Average/Paeth walk pixels left-to-right (the left-neighbor data
    dependency is inherent), vectorized across the row's byte lanes."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 1:  # Sub: cumulative sum per bpp lane (int64 —
            # an int32 cumsum overflows past ~8M-pixel rows)
            lanes = line.reshape(-1, bpp).astype(np.int64)
            rec = (np.cumsum(lanes, axis=0) & 0xFF).reshape(-1) \
                .astype(np.int32)
        elif ftype in (3, 4):
            # Average/Paeth: the left-recon dependency forces a per-
            # PIXEL walk, but each step is vectorized across the bpp
            # byte lanes (w iterations, not w*bpp — 4x fewer for RGBA)
            lane_line = line.reshape(-1, bpp)
            lane_prev = prev.reshape(-1, bpp)
            npx = lane_line.shape[0]
            lane_rec = np.zeros((npx, bpp), dtype=np.int32)
            a = np.zeros(bpp, dtype=np.int32)
            c = np.zeros(bpp, dtype=np.int32)
            for x in range(npx):
                bb = lane_prev[x]
                if ftype == 3:   # Average
                    r = (lane_line[x] + ((a + bb) >> 1)) & 0xFF
                else:            # Paeth
                    p = a + bb - c
                    pa = np.abs(p - a)
                    pb = np.abs(p - bb)
                    pc = np.abs(p - c)
                    pred = np.where((pa <= pb) & (pa <= pc), a,
                                    np.where(pb <= pc, bb, c))
                    r = (lane_line[x] + pred) & 0xFF
                lane_rec[x] = r
                a = r
                c = bb
            rec = lane_rec.reshape(-1)
        else:
            return out[:0]  # invalid filter byte: corrupt
        out[y] = rec.astype(np.uint8)
        prev = rec.astype(np.int32)
    return out


def decode_png(data: bytes | None) -> PngImage:
    """PNG bytes -> PngImage. TOTAL: never raises."""
    try:
        if not data or data[:8] != _SIG:
            return _fail("not_png")
        ihdr = None
        plte = None
        idat = []
        for typ, chunk in _chunks(data):
            if typ == b"IHDR":
                ihdr = chunk
            elif typ == b"PLTE":
                plte = chunk
            elif typ == b"IDAT":
                idat.append(chunk)
            elif typ == b"IEND":
                break
        if ihdr is None or len(ihdr) < 13:
            return _fail("truncated")
        w, h = struct.unpack(">II", ihdr[:8])
        depth, ctype, comp, filt, interlace = ihdr[8:13]
        if not (0 < w and 0 < h) or w * h > MAX_PIXELS:
            # failure statuses must stay int32-safe: the raw IHDR fields
            # are 32-bit unsigned and a hostile value would crash the
            # Arrow serializer of the whole decode job
            return _fail("unsupported_size",
                         w if w <= 0x7FFFFFFF else None,
                         h if h <= 0x7FFFFFFF else None)
        if interlace != 0:
            return _fail("unsupported_interlaced", w, h)
        if depth != 8:
            return _fail("unsupported_depth", w, h)
        if ctype not in _CHANNELS or comp != 0 or filt != 0:
            return _fail("unsupported_type", w, h)
        ch = _CHANNELS[ctype]
        stride = w * ch
        expected = h * (1 + stride)
        d = zlib.decompressobj()
        # bounded inflate: at most `expected` bytes come out, whatever
        # the IDAT claims (the zip-bomb guard)
        raw = d.decompress(b"".join(idat), expected)
        if len(raw) < expected:
            return _fail("truncated", w, h)
        rows = np.frombuffer(raw[:expected], dtype=np.uint8) \
            .reshape(h, 1 + stride)
        rec = _unfilter(rows, h, stride, ch)
        if rec.shape[0] != h:
            return _fail("corrupt", w, h)
        if ctype == 3:  # palette -> RGB
            if plte is None or len(plte) < 3:
                return _fail("corrupt", w, h)
            pal = np.frombuffer(
                plte[:3 * (len(plte) // 3)], dtype=np.uint8).reshape(-1, 3)
            idx = np.minimum(rec.reshape(-1), len(pal) - 1)
            return PngImage("ok", w, h, 3, pal[idx].tobytes())
        return PngImage("ok", w, h, ch, rec.tobytes())
    except Exception:
        return _fail("corrupt")


def encode_png(pixels: bytes, width: int, height: int,
               channels: int) -> bytes:
    """Raw 8-bit row-major pixels -> valid PNG (filter-0 rows, correct
    CRCs). channels: 1 grey, 2 grey+alpha, 3 RGB, 4 RGBA. The inverse
    of decode_png on its supported set (roundtrip pinned in pytest)."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixels length != height*width*channels")
    rows = b"".join(
        b"\x00" + pixels[y * stride:(y + 1) * stride]
        for y in range(height))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(rows))
            + chunk(b"IEND", b""))


def resample_nearest(pixels: bytes, width: int, height: int,
                     channels: int, out_w: int, out_h: int) -> bytes:
    """Deterministic integer nearest-neighbor resample: out[i, j] maps
    to in[(i*height)//out_h, (j*width)//out_w]. Total for any positive
    output dims; constant images stay constant (the planted-oracle
    property)."""
    a = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width,
                                                      channels)
    yi = (np.arange(out_h) * height) // out_h
    xi = (np.arange(out_w) * width) // out_w
    return a[yi][:, xi].tobytes()


def pixel_stats_of(pixels: bytes) -> tuple[int, str]:
    """(mean_x1000, md5 hex) of a raw 8-bit pixel byte stream — the ONE
    definition of the integer mean (floor of sum*1000 // count) shared
    by the PNG and GIF stats kernels, so the oracle arithmetic cannot
    drift between formats."""
    import hashlib

    a = np.frombuffer(pixels, dtype=np.uint8)
    mean_x1000 = int(a.sum(dtype=np.int64)) * 1000 // a.size if a.size else 0
    return mean_x1000, hashlib.md5(pixels).hexdigest()


def png_pixel_stats(data: bytes | None) -> tuple[str, int | None,
                                                 int | None, int | None,
                                                 int | None, str | None]:
    """(status, width, height, channels, mean_x1000, px_md5): the
    integer-exact summary the driver oracle verifies (see
    pixel_stats_of for the arithmetic)."""
    img = decode_png(data)
    if img.status != "ok":
        return (img.status, img.width, img.height, None, None, None)
    mean_x1000, md5_ = pixel_stats_of(img.pixels)
    return (img.status, img.width, img.height, img.channels, mean_x1000,
            md5_)
