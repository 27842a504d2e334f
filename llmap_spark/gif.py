"""REAL GIF pixel codec — pure-stdlib LZW, no codec libraries.

The sibling of llmap_spark.png: GIF's compression is LZW over palette
indices, fully implementable with integers — so the second-most-common
lossless web image format also gets a real decode path, and the
multimodal codec seam narrows to the genuinely entropy-coded formats
(JPEG's DCT/Huffman, WebP's VP8).

Kernel discipline: TOTAL (any bytes -> a typed status, never raises),
deterministic, bounded (pixel cap + LZW output capped at the exact
frame size), shared by the oracle CLI, pytest, and the Spark UDFs.

Scope: the FIRST image frame, composed onto the full canvas (background
-filled when the frame rect is smaller), global/local color tables,
interlaced and non-interlaced, GIF87a/89a. Animation beyond frame 1 is
out of scope (a training pipeline filters on the poster frame).

    decode_gif(data)  -> GifImage(status, width, height, channels=3,
                         pixels bytes | None)  row-major RGB
    encode_gif(indices, width, height, palette)  valid single-frame GIF
                         (fixed-width LZW with pre-growth clear codes)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

MAX_PIXELS = 64_000_000


class GifImage(NamedTuple):
    status: str          # ok | not_gif | truncated | corrupt | unsupported_*
    width: int | None
    height: int | None
    channels: int | None
    pixels: bytes | None  # h*w*3 RGB


def _fail(status: str, w=None, h=None) -> GifImage:
    return GifImage(status, w, h, None, None)


def _subblocks(b: bytes, i: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at offset i; returns
    (data, offset past the terminator). Truncation yields what was read."""
    out = []
    n = len(b)
    while i < n:
        ln = b[i]
        i += 1
        if ln == 0:
            break
        out.append(b[i:i + ln])
        i += ln
    return b"".join(out), i


def _lzw_decode(data: bytes, min_code: int, max_out: int) -> bytes | None:
    """GIF-flavor LZW: variable code width min_code+1..12, clear/end
    codes, dictionary rebuild on clear. Output capped at max_out indices
    (the frame size — a malicious stream cannot expand past it). None on
    structural corruption."""
    if not (1 <= min_code <= 11):
        return None
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8

    def reset():
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                min_code + 1)

    table, width = reset()
    prev: bytes | None = None
    while bitpos + width <= nbits:
        byte0 = bitpos >> 3
        chunk = int.from_bytes(data[byte0:byte0 + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                return None
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
        out += entry
        if len(out) >= max_out:
            return bytes(out[:max_out])
        prev = entry
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes | None) -> GifImage:
    """GIF bytes -> first frame composed on the canvas as RGB. TOTAL."""
    try:
        if not data or data[:6] not in (b"GIF87a", b"GIF89a"):
            return _fail("not_gif")
        if len(data) < 13:
            return _fail("truncated")
        w = int.from_bytes(data[6:8], "little")
        h = int.from_bytes(data[8:10], "little")
        flags, bg = data[10], data[11]
        if not (w and h) or w * h > MAX_PIXELS:
            return _fail("unsupported_size", w, h)
        i = 13
        gct = None
        if flags & 0x80:
            n = 3 * (2 << (flags & 7))
            gct = data[i:i + n]
            i += n
        while i < len(data):
            b0 = data[i]
            if b0 == 0x3B:  # trailer
                break
            if b0 == 0x21:  # extension: label + sub-blocks
                _, i = _subblocks(data, i + 2)
                continue
            if b0 != 0x2C:
                return _fail("corrupt", w, h)
            # image descriptor
            if i + 10 > len(data):
                return _fail("truncated", w, h)
            fx = int.from_bytes(data[i + 1:i + 3], "little")
            fy = int.from_bytes(data[i + 3:i + 5], "little")
            fw = int.from_bytes(data[i + 5:i + 7], "little")
            fh = int.from_bytes(data[i + 7:i + 9], "little")
            lflags = data[i + 9]
            i += 10
            ct = gct
            if lflags & 0x80:
                n = 3 * (2 << (lflags & 7))
                ct = data[i:i + n]
                i += n
            if ct is None or len(ct) < 3 or not (fw and fh):
                return _fail("corrupt", w, h)
            if i >= len(data):
                return _fail("truncated", w, h)
            min_code = data[i]
            lzw, i = _subblocks(data, i + 1)
            idx = _lzw_decode(lzw, min_code, fw * fh)
            if idx is None:
                return _fail("corrupt", w, h)
            if len(idx) < fw * fh:
                return _fail("truncated", w, h)
            if lflags & 0x40:  # de-interlace the frame rows
                rows = [idx[r * fw:(r + 1) * fw] for r in range(fh)]
                ordered: list[bytes | None] = [None] * fh
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for y in range(start, fh, step):
                        ordered[y] = rows[src]
                        src += 1
                idx = b"".join(r if r is not None else b"\x00" * fw
                               for r in ordered)
            # vectorized palette expansion (the PNG kernel's fancy-index
            # form — a per-pixel Python join was minutes per 64 MP frame)
            pal = np.frombuffer(
                ct[:3 * (len(ct) // 3)], dtype=np.uint8).reshape(-1, 3)
            ia = np.minimum(np.frombuffer(idx, dtype=np.uint8),
                            len(pal) - 1)
            frame = pal[ia].reshape(fh, fw, 3)
            if (fx, fy, fw, fh) == (0, 0, w, h):
                return GifImage("ok", w, h, 3, frame.tobytes())
            # compose the frame onto a background-filled canvas. The
            # Background Color Index is defined against the GLOBAL color
            # table (GIF89a spec), NOT the frame's local table; no GCT ->
            # black (the index is meaningless without one).
            if gct is not None and len(gct) >= 3 * (bg + 1):
                bg_rgb = np.frombuffer(gct[3 * bg:3 * bg + 3],
                                       dtype=np.uint8)
            else:
                bg_rgb = np.zeros(3, dtype=np.uint8)
            canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
            vh = min(fh, max(0, h - fy))
            vw = min(fw, max(0, w - fx))
            if vh > 0 and vw > 0:
                canvas[fy:fy + vh, fx:fx + vw] = frame[:vh, :vw]
            return GifImage("ok", w, h, 3, canvas.tobytes())
        return _fail("truncated", w, h)
    except Exception:
        return _fail("corrupt")


def encode_gif(indices: bytes, width: int, height: int,
               palette: bytes) -> bytes:
    """Palette indices + RGB palette -> valid single-frame GIF89a.
    LZW with literal codes only, emitting a CLEAR before the table
    would grow past the fixed width — the classic 'uncompressed GIF'
    construction, decodable by any conformant reader. Palette length
    is padded up to a power of two (2..256 entries)."""
    if len(indices) != width * height:
        raise ValueError("indices length != width*height")
    npal = max(2, len(palette) // 3)
    bits = max(1, (npal - 1).bit_length())
    npal = 1 << bits
    pal = (palette + b"\x00" * (3 * npal))[:3 * npal]
    if any(j >= npal for j in indices):
        raise ValueError("index out of palette range")
    min_code = max(2, bits)  # spec: LZW min code size >= 2
    clear = 1 << min_code
    end = clear + 1
    width_bits = min_code + 1
    # literal-code stream: table never grows past clear+2 because we
    # emit CLEAR every (2^width - clear - 2) literals
    out_bits = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width_bits
        while nacc >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    budget = (1 << width_bits) - end - 2
    count = 0
    for j in indices:
        if count >= budget:
            emit(clear)
            count = 0
        emit(j)
        count += 1
    emit(end)
    if nacc:
        out_bits.append(acc & 0xFF)
    data = bytes(out_bits)
    blocks = b"".join(
        bytes([min(255, len(data) - k)]) + data[k:k + 255]
        for k in range(0, len(data), 255)) + b"\x00"
    head = (b"GIF89a" + width.to_bytes(2, "little")
            + height.to_bytes(2, "little")
            + bytes([0x80 | (bits - 1), 0, 0]) + pal)
    desc = (b"\x2c" + b"\x00" * 4 + width.to_bytes(2, "little")
            + height.to_bytes(2, "little") + b"\x00")
    return head + desc + bytes([min_code]) + blocks + b"\x3b"
