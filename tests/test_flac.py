"""Real FLAC sample decoder: constant roundtrips, rice/FIXED/VERBATIM
paths against a spec-reference test encoder, stereo modes, totality."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings, strategies as st

from llmap_spark.flac import decode_flac, encode_flac_constant
from llmap_spark.media_meta import make_flac


class _W:
    """Test-side bit writer (independent of the kernel's)."""

    def __init__(self):
        self.bits: list[int] = []

    def w(self, v: int, n: int):
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def unary(self, q: int):
        self.bits.extend([0] * q + [1])

    def bytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        return bytes(
            int("".join(map(str, bits[i:i + 8])), 2)
            for i in range(0, len(bits), 8))


def _frame_header(w: _W, channels: int, blocksize: int, bits: int = 16):
    w.w(0x3FFE, 14)
    w.w(0, 1)
    w.w(0, 1)
    w.w(7, 4)            # blocksize as 16-bit field
    w.w(0, 4)            # rate from streaminfo
    w.w(channels - 1, 4)
    w.w(4 if bits == 16 else 1, 3)
    w.w(0, 1)
    w.w(0, 8)            # frame number 0 (utf8)
    w.w(blocksize - 1, 16)
    w.w(0, 8)            # crc8 (decoder is crc-tolerant)


def _rice_emit(w: _W, v: int, param: int):
    z = (v << 1) if v >= 0 else (((-v) << 1) - 1)
    w.unary(z >> param)
    if param:
        w.w(z & ((1 << param) - 1), param)


def _mk(samples_per_ch: list[list[int]], subframe_fn) -> bytes:
    """Build a one-frame FLAC whose subframes `subframe_fn` encodes."""
    ch = len(samples_per_ch)
    bs = len(samples_per_ch[0])
    head = make_flac(44100, ch, 16, bs)
    w = _W()
    _frame_header(w, ch, bs)
    for s in samples_per_ch:
        subframe_fn(w, s)
    # byte-align + crc16
    if len(w.bits) % 8:
        w.w(0, 8 - len(w.bits) % 8)
    w.w(0, 16)
    return head + w.bytes()


def _verbatim(w: _W, s: list[int]):
    w.w(0, 1)
    w.w(1, 6)
    w.w(0, 1)
    for v in s:
        w.w(v & 0xFFFF, 16)


def _fixed1_rice(param: int):
    def fn(w: _W, s: list[int]):
        w.w(0, 1)
        w.w(8 + 1, 6)         # FIXED order 1
        w.w(0, 1)
        w.w(s[0] & 0xFFFF, 16)  # warmup
        w.w(0, 2)             # residual method 0 (4-bit rice)
        w.w(0, 4)             # partition order 0
        w.w(param, 4)
        for i in range(1, len(s)):
            _rice_emit(w, s[i] - s[i - 1], param)
    return fn


def test_verbatim_roundtrip():
    rng = np.random.RandomState(7)
    s = [int(v) for v in rng.randint(-3000, 3000, size=64)]
    a = decode_flac(_mk([s], _verbatim))
    assert a.status == "ok"
    assert a.samples == b"".join(struct.pack("<h", v) for v in s)


def test_fixed_order1_rice_roundtrip():
    rng = np.random.RandomState(11)
    # a slowly varying signal: order-1 prediction leaves small residuals
    s = list(np.cumsum(rng.randint(-20, 21, size=96)).astype(int))
    for param in (0, 2, 5):
        a = decode_flac(_mk([s], _fixed1_rice(param)))
        assert a.status == "ok", param
        assert a.samples == b"".join(struct.pack("<h", v) for v in s)


def test_stereo_independent_channels():
    rng = np.random.RandomState(13)
    l = [int(v) for v in rng.randint(-500, 500, size=32)]
    r = [int(v) for v in rng.randint(-500, 500, size=32)]
    a = decode_flac(_mk([l, r], _verbatim))
    assert (a.status, a.channels, a.n_frames) == ("ok", 2, 32)
    want = b"".join(struct.pack("<hh", lv, rv) for lv, rv in zip(l, r))
    assert a.samples == want


def test_constant_encoder_roundtrips():
    for v in (0, -5, 1234, -32768, 32767):
        for n in (1, 256, 777):
            for ch in (1, 2):
                a = decode_flac(encode_flac_constant(v, n, 8000,
                                                     channels=ch))
                assert a.status == "ok"
                assert a.samples == struct.pack("<h", v) * (n * ch)
    # 8-bit input widens to int16
    a = decode_flac(encode_flac_constant(42, 16, 8000, bits=8))
    assert a.samples[:2] == struct.pack("<h", 42 << 8)


def test_streaminfo_only_and_garbage_are_typed():
    assert decode_flac(make_flac(44100, 2, 16, 100)).status == "truncated"
    assert decode_flac(None).status == "not_flac"
    assert decode_flac(b"fLaC").status == "truncated"
    assert decode_flac(b"junk").status == "not_flac"


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=300))
def test_total_on_arbitrary_bytes(data):
    for prefix in (b"", b"fLaC", make_flac(8000, 1, 16, 4)):
        r = decode_flac(prefix + data)
        assert isinstance(r.status, str)
        assert decode_flac(prefix + data) == r


def test_spark_audio_decode_dispatches_flac(spark):
    import hashlib

    from llmap_spark.functions.multimodal import with_audio_decode

    c = 60
    v = c * 257
    rows = [(0, encode_flac_constant(v, 40, 16000)),
            (1, b"ID3\x03\x00\x00\x00\x00\x00\x00")]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in
           with_audio_decode(df, "payload", keep_cols=("id",)).collect()}
    assert (out[0].status, out[0].sample_rate, out[0].n_frames) == (
        "ok", 16000, 40)
    assert out[0].mean_milli == v * 1000
    assert out[0].s_md5 == hashlib.md5(bytes([c, c]) * 40).hexdigest()
    assert out[1].status == "undecodable"


def test_high_frame_index_utf8_number():
    """Review finding: frame index >= 2048 needs the 3-byte UTF-8 form;
    the 2-byte form silently desynced the decoder."""
    n = 2050 * 8 + 5  # > 2048 frames at frame_size=8
    a = decode_flac(encode_flac_constant(7, n, 8000, frame_size=8))
    assert (a.status, a.n_frames) == ("ok", n)
    assert a.samples == struct.pack("<h", 7) * n


def test_truncation_keeps_metadata_and_completed_frames():
    """Review finding: a cut-off FLAC must keep STREAMINFO fields and
    every fully-decoded frame, like the WAV twin."""
    full = encode_flac_constant(9, 600, 8000)  # 3 frames of 256/256/88
    a = decode_flac(full[:-3])  # cut mid-final-frame
    assert a.status == "ok" and a.sample_rate == 8000
    assert a.n_frames in (256, 512)  # completed frames survive
    assert a.samples == struct.pack("<h", 9) * a.n_frames
    # cut before ANY frame completes: typed status WITH metadata
    head_only = full[: full.index(b"\xff\xf8") + 4]
    t = decode_flac(head_only)
    assert t.status == "truncated"
    assert (t.sample_rate, t.channels, t.bits) == (8000, 1, 16)
