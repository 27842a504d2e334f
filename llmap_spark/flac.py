"""REAL FLAC sample decoder — pure-stdlib bit reading, no codec library.

The audio sibling of llmap_spark.jpeg: FLAC is rice-coded linear
prediction over integers — fully implementable without a codec library,
and LOSSLESS by design, so decoded samples are exact and the planted
driver oracle hashes raw PCM byte-for-byte. With WAV PCM already real
(audio.py), only MP3's MDCT entropy coding remains codec-bound on the
audio side.

Kernel discipline: TOTAL (typed statuses, never raises), deterministic,
bounded (sample cap; per-frame block sizes from the header), shared by
pytest, the planted driver query, and the Spark op in
functions/multimodal.py.

Scope: 8/16-bit, all four subframe types (CONSTANT / VERBATIM / FIXED
orders 0-4 / LPC), 4-bit rice partitions with escapes, independent +
left-side / right-side / mid-side stereo, multiple frames. Frame CRCs
are not verified (tolerant decode — same policy as the PNG kernel's
chunk CRCs). The companion `encode_flac_constant` writes valid
constant-subframe frames (the planted-oracle generator — a constant
block is one header + one sample value per channel).

    decode_flac(data) -> FlacAudio(status, sample_rate, channels, bits,
                         n_frames, samples bytes | None)   interleaved
                         little-endian int16 (8-bit input widened)
"""

from __future__ import annotations

from typing import NamedTuple

MAX_SAMPLES = 64_000_000

FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


class FlacAudio(NamedTuple):
    status: str
    sample_rate: int | None
    channels: int | None
    bits: int | None
    n_frames: int | None
    samples: bytes | None


def _fail(status: str, sr=None, ch=None, bits=None) -> FlacAudio:
    if sr is not None and sr > 0x7FFFFFFF:
        sr = None
    return FlacAudio(status, sr, ch, bits, None, None)


class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos

    def read(self, n: int) -> int:
        out = 0
        d = self.data
        p = self.pos
        if (p + n) > len(d) * 8:
            raise EOFError
        for _ in range(n):
            out = (out << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        d = self.data
        p = self.pos
        nbits = len(d) * 8
        q = 0
        while p < nbits:
            if (d[p >> 3] >> (7 - (p & 7))) & 1:
                self.pos = p + 1
                return q
            q += 1
            p += 1
        raise EOFError

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _rice(br: _Bits, param: int) -> int:
    q = br.unary()
    r = br.read(param) if param else 0
    v = (q << param) | r
    return (v >> 1) ^ -(v & 1)  # zigzag


def _utf8_number(br: _Bits) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_extra = 0
    mask = 0x40
    while b0 & mask:
        n_extra += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n_extra):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
               13: 8192, 14: 16384, 15: 32768}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _residuals(br: _Bits, order: int, blocksize: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    out: list[int] = []
    for part in range(nparts):
        n = (blocksize >> po) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("bad partition layout")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            out.extend(br.read_signed(raw) if raw else 0
                       for _ in range(n))
        else:
            out.extend(_rice(br, param) for _ in range(n))
    return out


def _subframe(br: _Bits, bps: int, blocksize: int) -> list[int]:
    if br.read(1) != 0:
        raise ValueError("subframe padding bit")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
    eff = bps - wasted
    if ftype == 0:      # CONSTANT
        v = br.read_signed(eff)
        out = [v] * blocksize
    elif ftype == 1:    # VERBATIM
        out = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _residuals(br, order, blocksize)
        out = list(warm)
        coefs = FIXED_COEFS[order]
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(r + pred)
    elif ftype >= 32:   # LPC, order = ftype - 31
        order = ftype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid lpc precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative lpc shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _residuals(br, order, blocksize)
        out = list(warm)
        for r in res:
            acc = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(r + (acc >> shift))
    else:
        raise ValueError("reserved subframe type")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(data: bytes | None) -> FlacAudio:
    """FLAC bytes -> interleaved int16 little-endian samples. TOTAL."""
    try:
        if not data or data[:4] != b"fLaC":
            return _fail("not_flac")
        # walk metadata blocks to the audio frames
        i = 4
        sr = ch = bits = None
        while i + 4 <= len(data):
            hdr = data[i]
            last = bool(hdr & 0x80)
            btype = hdr & 0x7F
            blen = int.from_bytes(data[i + 1:i + 4], "big")
            if btype == 0 and blen >= 34:  # STREAMINFO
                info = data[i + 4:i + 4 + 34]
                packed = int.from_bytes(info[10:18], "big")
                sr = (packed >> 44) & 0xFFFFF
                ch = ((packed >> 41) & 0x7) + 1
                bits = ((packed >> 36) & 0x1F) + 1
            i += 4 + blen
            if last:
                break
        if sr is None:
            return _fail("truncated")
        if bits not in (8, 16):
            return _fail("unsupported_depth", sr, ch, bits)
        channels_out: list[list[int]] = [[] for _ in range(ch)]
        br = _Bits(data, i * 8)
        n_bits_total = len(data) * 8
        decoded_any = False
        while br.pos + 32 <= n_bits_total:
            try:
                sync = br.read(14)
            except EOFError:
                break
            if sync != 0x3FFE:
                if not decoded_any:
                    return _fail("corrupt", sr, ch, bits)
                break
            br.read(1)          # reserved
            br.read(1)          # blocking strategy
            bs_code = br.read(4)
            sr_code = br.read(4)
            ch_code = br.read(4)
            ss_code = br.read(3)
            br.read(1)          # reserved
            _utf8_number(br)
            if bs_code == 0:
                raise ValueError("reserved blocksize code")
            elif bs_code == 6:
                blocksize = br.read(8) + 1
            elif bs_code == 7:
                blocksize = br.read(16) + 1
            else:
                blocksize = _BLOCKSIZES[bs_code]
            if sr_code == 12:
                br.read(8)
            elif sr_code in (13, 14):
                br.read(16)
            elif sr_code == 15:
                raise ValueError("invalid sample rate code")
            bps = bits if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
            if bps is None:
                raise ValueError("reserved sample size")
            br.read(8)          # CRC-8 (not verified — tolerant)
            if ch_code < 8:
                nch = ch_code + 1
                subs = [_subframe(br, bps, blocksize)
                        for _ in range(nch)]
            elif ch_code == 8:    # left/side
                left = _subframe(br, bps, blocksize)
                side = _subframe(br, bps + 1, blocksize)
                subs = [left, [l - s for l, s in zip(left, side)]]
                nch = 2
            elif ch_code == 9:    # right/side
                side = _subframe(br, bps + 1, blocksize)
                right = _subframe(br, bps, blocksize)
                subs = [[r + s for r, s in zip(right, side)], right]
                nch = 2
            elif ch_code == 10:   # mid/side
                mid = _subframe(br, bps, blocksize)
                side = _subframe(br, bps + 1, blocksize)
                subs = []
                lefts, rights = [], []
                for m, s in zip(mid, side):
                    mm = (m << 1) | (s & 1)
                    lefts.append((mm + s) >> 1)
                    rights.append((mm - s) >> 1)
                subs = [lefts, rights]
                nch = 2
            else:
                raise ValueError("reserved channel assignment")
            if nch != ch:
                raise ValueError("frame channel count != streaminfo")
            br.align()
            br.read(16)         # CRC-16 (not verified)
            for c in range(ch):
                channels_out[c].extend(subs[c])
            decoded_any = True
            if sum(len(c) for c in channels_out) > MAX_SAMPLES:
                break
        if not decoded_any:
            return _fail("truncated", sr, ch, bits)
        return _emit(channels_out, sr, ch, bits)
    except EOFError:
        # mid-frame truncation: keep every COMPLETED frame's samples and
        # the parsed STREAMINFO fields (the WAV twin's behavior) — the
        # half-decoded frame was never appended, so channels stay aligned
        if decoded_any:
            return _emit(channels_out, sr, ch, bits)
        return _fail("truncated", sr, ch, bits)
    except Exception:
        return _fail("corrupt")


def _emit(channels_out: list[list[int]], sr, ch, bits) -> FlacAudio:
    import numpy as np

    n = min(len(c) for c in channels_out)
    shift = 16 - bits  # widen 8-bit to int16 (<< 8), keep 16 as-is
    arr = np.array([c[:n] for c in channels_out], dtype=np.int64)
    arr = np.clip(arr << shift, -32768, 32767)
    # vectorized interleave: (ch, n) -> n*ch int16 LE (a per-sample
    # Python loop here stalled a task for minutes at the sample cap)
    return FlacAudio("ok", sr, ch, 16, n, arr.T.astype("<i2").tobytes())


# ---------------------------------------------------------------------------
# constant-frame encoder (tests + planted oracle)
# ---------------------------------------------------------------------------

class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)


def encode_flac_constant(value: int, n_samples: int, sample_rate: int,
                         channels: int = 1, bits: int = 16,
                         frame_size: int = 256) -> bytes:
    """Valid FLAC whose every frame carries CONSTANT subframes of
    `value` — the planted-oracle generator (lossless by construction:
    decode_flac returns exactly `value` for every sample). CRC fields
    are zero-filled (the decoder is CRC-tolerant by documented policy)."""
    from llmap_spark.media_meta import make_flac

    head = make_flac(sample_rate, channels, bits, n_samples)
    frames = bytearray()
    done = 0
    idx = 0
    while done < n_samples:
        bs = min(frame_size, n_samples - done)
        w = _BitW()
        w.write(0x3FFE, 14)     # sync
        w.write(0, 1)           # reserved
        w.write(0, 1)           # fixed blocksize strategy
        w.write(7, 4)           # blocksize: 16-bit at end of header
        w.write(0, 4)           # sample rate: from STREAMINFO
        w.write(channels - 1, 4)  # independent channels
        w.write(4 if bits == 16 else 1, 3)  # sample size
        w.write(0, 1)           # reserved
        # UTF-8-style frame number, 1-3 bytes (review finding: the old
        # 2-byte form set a third lead bit past idx 2047 and produced
        # files the decoder read as truncated)
        if idx < 0x80:
            w.write(idx, 8)
        elif idx < 0x800:
            w.write(0xC0 | (idx >> 6), 8)
            w.write(0x80 | (idx & 0x3F), 8)
        elif idx < 0x10000:
            w.write(0xE0 | (idx >> 12), 8)
            w.write(0x80 | ((idx >> 6) & 0x3F), 8)
            w.write(0x80 | (idx & 0x3F), 8)
        else:
            raise ValueError(
                "encode_flac_constant supports < 65536 frames "
                f"({65536 * frame_size} samples at frame_size="
                f"{frame_size}); raise frame_size for longer streams")
        w.write(bs - 1, 16)
        w.write(0, 8)           # CRC-8 (unverified)
        for _ in range(channels):
            w.write(0, 1)       # padding
            w.write(0, 6)       # CONSTANT
            w.write(0, 1)       # no wasted bits
            w.write(value & ((1 << bits) - 1), bits)
        w.align()
        w.write(0, 16)          # CRC-16 (unverified)
        frames += w.out
        done += bs
        idx += 1
    return head + bytes(frames)
