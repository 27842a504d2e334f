"""REAL WAV PCM sample decode — stdlib struct + numpy, no codec libs.

The audio sibling of llmap_spark.png/gif: PCM is raw samples, so the
most common uncompressed audio container gets a real decode path and
the multimodal audio seam narrows to the genuinely codec-bound formats
(MP3's MDCT/Huffman, FLAC's rice coding — header METADATA for those is
already real in llmap_spark.media_meta).

Kernel discipline: TOTAL, deterministic, bounded (sample cap; the data
chunk is clipped to its declared size), shared by oracle CLI, pytest
and the Spark UDF. All stats are integer-exact (sum/abs-sum based) so
the driver oracle hashes them across engines.

    decode_wav(data)  -> WavAudio(status, sample_rate, channels, bits,
                         n_frames, samples bytes | None)  samples are
                         the raw interleaved PCM bytes as stored
    encode_wav(samples, sample_rate, channels, bits)  valid RIFF/WAVE
    wav_sample_stats(data) -> (status, sample_rate, channels, n_frames,
                         mean_milli, abs_mean_milli, s_md5)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

MAX_SAMPLE_BYTES = 256_000_000  # 256 MB of PCM — bounded-work cap


class WavAudio(NamedTuple):
    status: str        # ok | not_wav | truncated | unsupported_* | corrupt
    sample_rate: int | None
    channels: int | None
    bits: int | None
    n_frames: int | None
    samples: bytes | None


def _fail(status: str, sr=None, ch=None, bits=None) -> WavAudio:
    return WavAudio(status, sr, ch, bits, None, None)


def decode_wav(data: bytes | None) -> WavAudio:
    """RIFF/WAVE bytes -> PCM samples. Supports format 1 (integer PCM)
    at 8 or 16 bits. TOTAL: never raises."""
    try:
        if not data or len(data) < 12 or data[:4] != b"RIFF" \
                or data[8:12] != b"WAVE":
            return _fail("not_wav")
        fmt = None
        pcm = None
        i, n = 12, len(data)
        while i + 8 <= n:
            cid = data[i:i + 4]
            size = int.from_bytes(data[i + 4:i + 8], "little")
            body = data[i + 8:i + 8 + size]
            if cid == b"fmt " and fmt is None:
                fmt = body
            elif cid == b"data" and pcm is None:
                pcm = body
            i += 8 + size + (size & 1)
        if fmt is None or len(fmt) < 16:
            return _fail("truncated")
        audio_format = int.from_bytes(fmt[0:2], "little")
        ch = int.from_bytes(fmt[2:4], "little")
        sr = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if sr > 0x7FFFFFFF:
            # the raw field is 32-bit unsigned; an int32 Arrow column
            # must never see a value it cannot hold (one corrupt row
            # would kill the whole decode job at the serializer)
            sr = None
        if audio_format != 1:
            return _fail("unsupported_format", sr, ch, bits)
        if bits not in (8, 16) or ch == 0 or sr is None:
            return _fail("unsupported_layout", sr, ch, bits)
        if pcm is None:
            return _fail("truncated", sr, ch, bits)
        pcm = pcm[:MAX_SAMPLE_BYTES]
        frame = ch * bits // 8
        n_frames = len(pcm) // frame
        return WavAudio("ok", sr, ch, bits, n_frames,
                        pcm[:n_frames * frame])
    except Exception:
        return _fail("corrupt")


def encode_wav(samples: bytes, sample_rate: int, channels: int = 1,
               bits: int = 16) -> bytes:
    """Raw interleaved PCM bytes -> valid RIFF/WAVE (format 1). The
    byte layout lives in media_meta.wav_bytes (stdlib-only module) so
    the header kernel never imports numpy through this one."""
    from llmap_spark.media_meta import wav_bytes

    return wav_bytes(samples, sample_rate, channels, bits)


def wav_sample_stats(data: bytes | None) -> tuple:
    """(status, sample_rate, channels, n_frames, mean_milli,
    abs_mean_milli, s_md5): integer-exact sample statistics — signed
    mean and mean absolute amplitude x1000 (floor), md5 of the raw PCM
    bytes. 8-bit WAV is unsigned per spec (centered at 128); 16-bit is
    signed little-endian."""
    import hashlib

    a = decode_wav(data)
    if a.status != "ok":
        return (a.status, a.sample_rate, a.channels, None, None, None,
                None)
    if a.bits == 16:
        s = np.frombuffer(a.samples, dtype="<i2").astype(np.int64)
    else:
        s = np.frombuffer(a.samples, dtype=np.uint8).astype(np.int64) - 128
    if s.size == 0:
        return (a.status, a.sample_rate, a.channels, 0, 0, 0,
                hashlib.md5(b"").hexdigest())
    mean_milli = int(s.sum()) * 1000 // s.size
    abs_mean_milli = int(np.abs(s).sum()) * 1000 // s.size
    return (a.status, a.sample_rate, a.channels, a.n_frames,
            mean_milli, abs_mean_milli,
            hashlib.md5(a.samples).hexdigest())
