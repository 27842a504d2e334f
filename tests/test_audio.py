"""Real WAV PCM decode (llmap_spark.audio): roundtrips, stats, totality."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
from hypothesis import given, settings, strategies as st

from llmap_spark.audio import decode_wav, encode_wav, wav_sample_stats


def test_roundtrip_16bit_stereo():
    rng = np.random.RandomState(3)
    s = rng.randint(-32768, 32768, size=400, dtype=np.int16)
    data = encode_wav(s.tobytes(), 44100, channels=2, bits=16)
    a = decode_wav(data)
    assert (a.status, a.sample_rate, a.channels, a.bits,
            a.n_frames) == ("ok", 44100, 2, 16, 200)
    assert a.samples == s.tobytes()


def test_roundtrip_8bit_mono_and_stats():
    s = bytes([128, 130, 126, 128] * 25)  # centered at 128 -> mean 0
    a = decode_wav(encode_wav(s, 8000, channels=1, bits=8))
    assert (a.status, a.bits, a.n_frames) == ("ok", 8, 100)
    st_ = wav_sample_stats(encode_wav(s, 8000, 1, 8))
    assert st_[0] == "ok" and st_[4] == 0      # signed mean 0
    assert st_[5] == 1000                      # |{0,2,-2,0}| mean = 1
    assert st_[6] == hashlib.md5(s).hexdigest()


def test_constant_sample_stats_are_arithmetic():
    c = 42
    s = bytes([c, c]) * 60  # int16 LE value c*257, 60 frames mono
    st_ = wav_sample_stats(encode_wav(s, 16000, 1, 16))
    assert st_ == ("ok", 16000, 1, 60, c * 257 * 1000, c * 257 * 1000,
                   hashlib.md5(s).hexdigest())


def test_extra_chunks_and_odd_sizes_walk():
    s = struct.pack("<4h", 1, -1, 2, -2)
    data = encode_wav(s, 22050, 1, 16)
    # splice a LIST chunk with odd size (word-aligned walk) before fmt
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"
    spliced = data[:12] + extra + data[12:]
    # fix RIFF size (not verified by the decoder, but keep it honest)
    a = decode_wav(spliced)
    assert a.status == "ok" and a.samples == s


def test_unsupported_and_truncated_statuses():
    # float WAV (format 3)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    assert decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body
                      ).status == "unsupported_format"
    assert decode_wav(b"RIFFxxxxWAVE").status == "truncated"
    assert decode_wav(b"nope").status == "not_wav"
    # partial final frame is clipped, not an error
    s = struct.pack("<3h", 5, 6, 7) + b"\x01"
    a = decode_wav(encode_wav(s, 8000, 1, 16))
    assert a.status == "ok" and a.n_frames == 3


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=200))
def test_total_on_arbitrary_bytes(data):
    for prefix in (b"", b"RIFF\x10\x00\x00\x00WAVE"):
        r = decode_wav(prefix + data)
        assert isinstance(r.status, str)
        assert decode_wav(prefix + data) == r


def test_spark_audio_decode_op(spark):
    from llmap_spark.functions.multimodal import with_audio_decode

    c = 50
    s = bytes([c, c]) * 30
    rows = [(0, encode_wav(s, 8000, 1, 16)),
            (1, b"ID3\x03\x00\x00\x00\x00\x00\x00"),  # mp3-ish
            (2, None)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in
           with_audio_decode(df, "payload", keep_cols=("id",)).collect()}
    assert (out[0].status, out[0].sample_rate, out[0].n_frames) == (
        "ok", 8000, 30)
    assert out[0].mean_milli == c * 257 * 1000
    assert out[0].s_md5 == hashlib.md5(s).hexdigest()
    # the op dispatches WAV -> FLAC; unrecognized bytes are the MP3 seam
    assert out[1].status == "undecodable" and out[1].s_md5 is None
    assert out[2].status == "undecodable"


def test_hostile_sample_rate_stays_int32_safe(spark):
    """A 32-bit sample_rate field beyond int32 must yield a typed status
    with a NULL rate — not crash the Arrow serializer of the whole job
    (review finding: one corrupt row killed the decode stage)."""
    from llmap_spark.functions.multimodal import with_audio_decode

    fmt = struct.pack("<HHIIHH", 1, 1, 4_000_000_000 % (1 << 32), 0, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    hostile = b"RIFF" + struct.pack("<I", len(body)) + body
    a = decode_wav(hostile)
    assert a.status == "unsupported_layout" and a.sample_rate is None
    df = spark.createDataFrame([(0, hostile)], "id long, payload binary")
    rows = with_audio_decode(df, "payload", keep_cols=("id",)).collect()
    assert rows[0].status == "unsupported_layout"
