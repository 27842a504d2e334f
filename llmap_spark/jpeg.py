"""REAL baseline JPEG decoder — stdlib bit-reading + numpy IDCT.

The last of the decodable-here image formats: baseline sequential DCT
JPEG is Huffman coding + dequantization + an 8x8 inverse DCT + YCbCr
conversion, all expressible with integers and a numpy matrix multiply —
no codec library required. With PNG and GIF real (png.py / gif.py),
the multimodal decode seam now narrows to WebP (VP8) alone.

Kernel discipline: TOTAL (any bytes -> typed status, never raises),
deterministic (fixed IDCT matrix, fixed rounding), bounded (pixel cap;
entropy decode stops at the declared MCU count), shared by oracle CLI,
pytest and the Spark ops.

Scope: baseline sequential (SOF0), 8-bit, greyscale or YCbCr with
4:4:4 / 4:2:0 / 4:2:2 subsampling, restart markers. Progressive
(SOF2), arithmetic coding, and 12-bit return typed unsupported
statuses.

The companion `encode_jpeg` (tests + planted oracles) writes baseline
4:4:4 with ALL-ONES quantization tables: a constant 8x8 block then has
a DC-only spectrum that quantizes losslessly, so constant-color images
roundtrip EXACTLY (the planted-oracle property), and arbitrary images
roundtrip within +-1 per sample (float DCT rounding), which pytest
pins.

    decode_jpeg(data) -> JpegImage(status, width, height, channels,
                         pixels bytes | None)  row-major, RGB or grey
    encode_jpeg(pixels, width, height, channels)  valid baseline JFIF
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

MAX_PIXELS = 64_000_000

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int32)

# orthonormal 8-point DCT-II matrix (float64; fixed -> deterministic)
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5)

# standard Annex K Huffman tables (bits counts per code length 1..16,
# then symbol values) — the tables every baseline encoder ships
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


class JpegImage(NamedTuple):
    status: str
    width: int | None
    height: int | None
    channels: int | None
    pixels: bytes | None


def _fail(status: str, w=None, h=None) -> JpegImage:
    if w is not None and w > 0x7FFFFFFF:
        w = None
    if h is not None and h > 0x7FFFFFFF:
        h = None
    return JpegImage(status, w, h, None, None)


def _build_huff(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical JPEG code assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; raises _EOB on exhaustion (caught by the decoder)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                break
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    self.pos -= 1  # a real marker: stop feeding
                    break
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
            if self.nbits < n:
                raise _EOB()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise _EOB()


class _EOB(Exception):
    pass


def _extend(v: int, n: int) -> int:
    """JPEG signed magnitude: an n-bit value v decodes to v if its top
    bit is set, else v - (2^n - 1)."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(data: bytes | None) -> JpegImage:
    """Baseline JPEG bytes -> 8-bit pixels (grey or RGB). TOTAL."""
    try:
        if not data or data[:2] != b"\xff\xd8":
            return _fail("not_jpeg")
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
        comps = None
        w = h = 0
        restart_interval = 0
        i = 2
        n = len(data)
        while i + 4 <= n:
            if data[i] != 0xFF:
                return _fail("corrupt", w or None, h or None)
            marker = data[i + 1]
            if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(data[i + 2:i + 4], "big")
            seg = data[i + 4:i + 2 + seg_len]
            if marker == 0xC4:  # DHT (possibly several tables)
                j = 0
                while j + 17 <= len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 0xF
                    bits = list(seg[j + 1:j + 17])
                    nv = sum(bits)
                    vals = list(seg[j + 17:j + 17 + nv])
                    huff[(tc, th)] = _build_huff(bits, vals)
                    j += 17 + nv
            elif marker == 0xDB:  # DQT
                j = 0
                while j + 1 <= len(seg):
                    prec, tid = seg[j] >> 4, seg[j] & 0xF
                    if prec != 0:
                        return _fail("unsupported_precision")
                    if j + 65 > len(seg):
                        break
                    tbl = np.zeros(64, dtype=np.int32)
                    tbl[ZIGZAG] = np.frombuffer(
                        seg[j + 1:j + 65], dtype=np.uint8)
                    qt[tid] = tbl.reshape(8, 8)
                    j += 65
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(seg[:2], "big")
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return _fail("unsupported_progressive")
            elif marker == 0xC0:  # SOF0 baseline
                if seg[0] != 8:
                    return _fail("unsupported_depth")
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                nc = seg[5]
                if nc not in (1, 3):
                    return _fail("unsupported_components", w, h)
                # bound TOTAL samples (w*h*components), not just pixels:
                # a just-under-cap color image would otherwise drive
                # multi-GB float plane allocations (bounded-work rule)
                if not (w and h) or w * h * nc > MAX_PIXELS:
                    return _fail("unsupported_size", w, h)
                comps = []
                for c in range(nc):
                    cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                    comps.append({"id": cid, "hs": samp >> 4,
                                  "vs": samp & 0xF, "tq": tq})
            elif marker == 0xDA:  # SOS
                if comps is None:
                    return _fail("corrupt")
                ns = seg[0]
                for c in range(ns):
                    cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                    for comp in comps:
                        if comp["id"] == cid:
                            comp["td"] = tabs >> 4
                            comp["ta"] = tabs & 0xF
                scan = data[i + 2 + seg_len:]
                return _decode_scan(scan, comps, qt, huff, w, h,
                                    restart_interval)
            i += 2 + seg_len
        return _fail("truncated", w or None, h or None)
    except Exception:
        return _fail("corrupt")


def _decode_scan(scan: bytes, comps, qt, huff, w, h,
                 restart_interval) -> JpegImage:
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        return _fail("unsupported_sampling", w, h)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = []
    for c in comps:
        pw, ph = mcus_x * 8 * c["hs"], mcus_y * 8 * c["vs"]
        # float32 planes: half the footprint of float64 at identical
        # rounded output (IDCT magnitudes <= ~2048, well inside the
        # 24-bit mantissa; constant-image exactness is preserved)
        planes.append(np.zeros((ph, pw), dtype=np.float32))
        if c["tq"] not in qt or (0, c.get("td", 0)) not in huff \
                or (1, c.get("ta", 0)) not in huff:
            return _fail("corrupt", w, h)
    # strip restart markers, concatenating the entropy segments (the
    # reader's unstuffing stops at real markers, so we pre-split here)
    br = _BitReader(scan)
    pred = [0] * len(comps)
    mcu_count = 0
    total_mcus = mcus_x * mcus_y
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                # byte-align and skip the RSTn marker
                br.nbits = 0
                br.acc = 0
                p = br.pos
                while p + 1 < len(br.data):
                    if br.data[p] == 0xFF and 0xD0 <= br.data[p + 1] <= 0xD7:
                        p += 2
                        break
                    p += 1
                else:
                    return _fail("truncated", w, h)
                br.pos = p
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t = huff[(0, c.get("td", 0))]
                ac_t = huff[(1, c.get("ta", 0))]
                q = qt[c["tq"]]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        try:
                            blk = _decode_block(br, dc_t, ac_t)
                        except _EOB:
                            if mcu_count == 0:
                                return _fail("truncated", w, h)
                            blk = np.zeros(64, dtype=np.int32)
                            blk[0] = 0
                        pred[ci] += int(blk[0])
                        coeffs = np.zeros(64, dtype=np.float64)
                        coeffs[ZIGZAG] = blk
                        coeffs[ZIGZAG[0]] = pred[ci]
                        m = coeffs.reshape(8, 8) * q
                        # 2-D inverse DCT via the orthonormal matrix
                        px = _C.T @ m @ _C + 128.0
                        y0 = (my * c["vs"] + by) * 8
                        x0 = (mx * c["hs"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    out_planes = []
    for ci, c in enumerate(comps):
        p = np.clip(np.round(planes[ci]), 0, 255).astype(np.uint8)
        planes[ci] = None  # free each float plane as it converts
        # upsample subsampled chroma to full resolution
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        return JpegImage("ok", w, h, 1, out_planes[0].tobytes())
    # per-channel float32 conversion into a preallocated uint8 result —
    # peak memory stays ~O(total samples), never the float64 stack the
    # first version paid
    y, cb, cr = (pl.astype(np.float32) for pl in out_planes)
    out = np.empty((h, w, 3), dtype=np.uint8)
    cbf = cb - np.float32(128.0)
    crf = cr - np.float32(128.0)
    for k, chan in enumerate((y + np.float32(1.402) * crf,
                              y - np.float32(0.344136) * cbf
                              - np.float32(0.714136) * crf,
                              y + np.float32(1.772) * cbf)):
        out[..., k] = np.clip(np.round(chan), 0, 255).astype(np.uint8)
    return JpegImage("ok", w, h, 3, out.tobytes())


def _decode_block(br: _BitReader, dc_t, ac_t) -> np.ndarray:
    blk = np.zeros(64, dtype=np.int32)
    s = br.huff(dc_t)
    blk[0] = _extend(br.read(s), s)
    k = 1
    while k < 64:
        rs = br.huff(ac_t)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            break
        blk[k] = _extend(br.read(s), s)
        k += 1
    return blk


# ---------------------------------------------------------------------------
# encoder (tests + planted oracles): baseline 4:4:4, all-ones quant
# ---------------------------------------------------------------------------

def _encode_huff_tables():
    def canon(bits, vals):
        out = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                out[vals[k]] = (ln, code)
                k += 1
                code += 1
            code <<= 1
        return out

    return (canon(_DC_LUM_BITS, _DC_LUM_VALS),
            canon(_AC_LUM_BITS, _AC_LUM_VALS),
            canon(_DC_CHR_BITS, _DC_CHR_VALS),
            canon(_AC_CHR_BITS, _AC_CHR_VALS))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int):
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _mag(v: int) -> tuple[int, int]:
    """value -> (size, raw bits) per the JPEG magnitude coding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bitsv = v if v > 0 else v + (1 << s) - 1
    return s, bitsv


def _encode_plane_block(wtr, block: np.ndarray, pred: int,
                        dc_tab, ac_tab) -> int:
    f = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    coeffs = np.round(f).astype(np.int32)  # all-ones quant
    zz = coeffs.reshape(-1)[ZIGZAG]
    dc = int(zz[0])
    s, bits = _mag(dc - pred)
    ln, code = dc_tab[s]
    wtr.write(code, ln)
    if s:
        wtr.write(bits, s)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tab[0xF0]
            wtr.write(code, ln)
            run -= 16
        s, bits = _mag(v)
        ln, code = ac_tab[(run << 4) | s]
        wtr.write(code, ln)
        wtr.write(bits, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_tab[0x00]
        wtr.write(code, ln)
    return dc


def encode_jpeg(pixels: bytes, width: int, height: int,
                channels: int) -> bytes:
    """8-bit grey (channels=1) or RGB (channels=3) -> baseline JFIF,
    4:4:4, ALL-ONES quant (DC-only content roundtrips exactly;
    arbitrary content within +-1 — see module docstring)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixels length != width*height*channels")
    a = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width,
                                                      channels)
    if channels == 3:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [np.clip(np.round(p), 0, 255)
                  for p in (y, cb, cr)]
    else:
        planes = [a[..., 0].astype(np.float64)]
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    dc_l, ac_l, dc_c, ac_c = _encode_huff_tables()
    wtr = _BitWriter()
    preds = [0] * channels
    for my in range(bh):
        for mx in range(bw):
            for ci in range(channels):
                p = planes[ci]
                blk = np.zeros((8, 8))
                ys, xs = my * 8, mx * 8
                yh = min(8, height - ys)
                xw = min(8, width - xs)
                blk[:yh, :xw] = p[ys:ys + yh, xs:xs + xw]
                # edge replication (better than zero-pad for DC purity)
                if yh < 8:
                    blk[yh:, :xw] = blk[yh - 1, :xw]
                if xw < 8:
                    blk[:, xw:] = blk[:, xw - 1:xw]
                dc_tab, ac_tab = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                preds[ci] = _encode_plane_block(
                    wtr, blk, preds[ci], dc_tab, ac_tab)
    wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    dqt = seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof_comps = b""
    for ci in range(channels):
        sof_comps += bytes([ci + 1, 0x11, 0])
    sof = seg(0xC0, bytes([8]) + height.to_bytes(2, "big")
              + width.to_bytes(2, "big") + bytes([channels]) + sof_comps)

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                   + bytes(vals))

    tables = dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS) \
        + dht(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if channels == 3:
        tables += dht(0, 1, _DC_CHR_BITS, _DC_CHR_VALS) \
            + dht(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)
    sos_comps = b""
    for ci in range(channels):
        sos_comps += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos = seg(0xDA, bytes([channels]) + sos_comps + bytes([0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + tables + sos + bytes(wtr.out)
            + b"\xff\xd9")
