"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with struct metadata, exactly
like `html` does in the pages table. The Spark side — schemas, batch
shapes, partition behavior, UDF signatures — is real and tested, and the
decode story is now split by what the environment can actually do:

  * `sniff_media_type` is pure JVM expression (magic-byte prefix match);
  * PNG pixel decode / resample / re-encode are REAL (llmap_spark.png:
    stdlib zlib inflate + numpy unfilter, all five scanline filters),
    as are GIF (llmap_spark.gif: pure-stdlib LZW) and baseline JPEG
    (llmap_spark.jpeg: Huffman + dequant + numpy IDCT) —
    `decode_image`, `resize_image`, `with_png_decode` and
    `with_image_decode` run them;
  * `with_pdf_text` / `extract_any`'s PDF branch are REAL: stdlib text-layer
    extraction via llmap_spark.pdf (zlib FlateDecode + content-stream
    text-show operators);
  * only WebP's VP8 entropy coder remains codec-bound:
    `decode_image`/`resize_image` raise the documented
    NotImplementedError for it, and `media_features` remains the
    clearly-marked deterministic fake with the real mapInPandas shape
    (header METADATA for every format is real — llmap_spark.media_meta).

At 100 TB the rules that matter are the ones enforced here: binary columns
never pass through row-at-a-time Python, batches stay small (session.py
caps Arrow batch rows), and metadata extraction happens once, close to the
scan, so downstream stages filter on cheap typed columns instead of
re-reading payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

MEDIA_FEATURES_SCHEMA = (
    "n_bytes long, entropy_x1000 int, mean_byte int, nonzero_frac_x1000 int"
)

# magic-byte prefixes -> media type (hex upper-case, as F.hex produces);
# RIFF is handled separately (its real type lives in bytes 9-12)
_MAGIC = [
    ("25504446", "application/pdf"),  # %PDF
    ("FFD8FF", "image/jpeg"),
    ("89504E47", "image/png"),
    ("47494638", "image/gif"),
    ("494433", "audio/mpeg"),
    ("1A45DFA3", "video/webm"),
    ("3C21444F", "text/html"),   # "<!DO"
    ("3C68746D", "text/html"),   # "<htm"
]
# RIFF fourcc at bytes 9-12 (hex offsets 17-24 of the 12-byte head)
_RIFF_KINDS = [("57415645", "audio/wav"),    # WAVE
               ("57454250", "image/webp"),   # WEBP
               ("41564920", "video/avi")]    # 'AVI '


def sniff_media_type(col: Column) -> Column:
    """JVM-side magic-byte sniff: hex-prefix match on the first bytes.
    No UDF — runs at scan speed inside codegen. RIFF containers dispatch
    on the fourcc at bytes 9-12 (WAVE/WEBP/AVI) exactly like
    media_meta.parse_media_meta — labeling every RIFF as audio/wav would
    route WebP images into the audio bucket."""
    head = F.upper(F.hex(F.substring(col, 1, 12)))
    expr = F.lit("application/octet-stream")
    for prefix, mtype in reversed(_MAGIC):
        expr = F.when(head.startswith(prefix), F.lit(mtype)).otherwise(expr)
    riff = head.startswith("52494646")
    fourcc = F.substring(head, 17, 8)
    for cc, mtype in _RIFF_KINDS:
        expr = F.when(riff & (fourcc == cc), F.lit(mtype)).otherwise(expr)
    # unknown RIFF payload types stay unclassified
    expr = F.when(riff & ~fourcc.isin(*[cc for cc, _ in _RIFF_KINDS]),
                  F.lit("application/octet-stream")).otherwise(expr)
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(expr)


def media_features(batches: Iterator[pd.DataFrame],
                   binary_col: str = "payload") -> Iterator[pd.DataFrame]:
    """DETERMINISTIC FAKE decode standing in for a real codec: byte
    histogram statistics per payload. The mapInPandas contract (iterator of
    batches in, same row count out, numpy-vectorized math) is exactly what
    a real image/audio feature extractor uses — swap the body, keep the
    plumbing."""
    for pdf in batches:
        n_bytes, ent, mean_b, nz = [], [], [], []
        for v in pdf[binary_col]:
            if v is None or len(v) == 0:
                n_bytes.append(0); ent.append(0); mean_b.append(0); nz.append(0)
                continue
            arr = np.frombuffer(v, dtype=np.uint8)
            counts = np.bincount(arr, minlength=256).astype(np.float64)
            p = counts[counts > 0] / arr.size
            n_bytes.append(int(arr.size))
            ent.append(int(round(float(-(p * np.log2(p)).sum()) * 1000)))
            mean_b.append(int(arr.mean()))
            nz.append(int(round(float((arr != 0).mean()) * 1000)))
        yield pd.DataFrame({"n_bytes": n_bytes, "entropy_x1000": ent,
                            "mean_byte": mean_b, "nonzero_frac_x1000": nz})


def with_media_features(df: DataFrame, binary_col: str,
                        keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Attach fake-decode features to every row, carrying `keep_cols`
    through the Arrow boundary untouched."""
    from llmap_spark.functions.arrow_carry import map_with_carry

    def batch(series: pd.Series) -> pd.DataFrame:
        return next(media_features(
            iter([series.to_frame(name=binary_col)]), binary_col))

    return map_with_carry(df, binary_col, keep_cols,
                          MEDIA_FEATURES_SCHEMA, batch)


PDF_TEXT_SCHEMA = "extracted_text string, status string"


def extract_any(payload: bytes | None):
    """Media-dispatching extraction (reference analogue: per-filetype parse
    dispatch, parse.py:236-240): html -> the block kernel; PDF -> the
    stdlib text-layer kernel (llmap_spark.pdf). Both kernels are total —
    statuses, never exceptions (never-throw rule for Arrow kernels)."""
    from llmap_spark import kernel, pdf

    if payload is not None and payload[:4] == b"%PDF":
        text, status = pdf.extract_pdf_text(payload)
        return kernel.PageResult(text, [], 1 if text else 0, 1, status)
    return kernel.extract_page(payload)


def with_pdf_text(df: DataFrame, binary_col: str,
                  keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """PDF text layer per row via the shared stdlib kernel
    (llmap_spark.pdf.extract_pdf_text — the same function the in-process
    oracle calls), carrying `keep_cols` through the Arrow boundary."""
    from llmap_spark.functions.arrow_carry import map_with_carry
    from llmap_spark.pdf import extract_pdf_text

    def batch(series: pd.Series) -> pd.DataFrame:
        res = [extract_pdf_text(v) for v in series]
        return pd.DataFrame({"extracted_text": [t for t, _ in res],
                             "status": [s for _, s in res]})

    return map_with_carry(df, binary_col, keep_cols, PDF_TEXT_SCHEMA, batch)


FRAME_SAMPLE_SCHEMA = ("frame_idx int, frame_offset long, frame_len int, "
                       "frame_crc32 long")


def with_frame_samples(df: DataFrame, binary_col: str,
                       keep_cols: tuple[str, ...] = (),
                       n_frames: int = 4) -> DataFrame:
    """Frame sampling PLUMBING for video payloads: 1 payload row -> up to
    `n_frames` frame rows via mapInPandas (the Spark shape — schema,
    1:N fan-out, batch iteration, carried keys — is exactly what a real
    ffmpeg-backed sampler uses). The decode itself is a DECLARED FAKE (no
    codec libs in this container): 'frames' are evenly spaced payload
    slices identified by (offset, length, crc32), deterministic so tests
    pin the fan-out. Swap the slicing for real frame extraction on a
    cluster with codecs; the plan shape does not change."""
    import zlib as _zlib

    cols = list(keep_cols) + [binary_col]
    dtypes = dict(df.dtypes)
    carry_ddl = ", ".join(f"{c} {dtypes[c]}" for c in keep_cols)
    out_schema = (carry_ddl + ", " if carry_ddl else "") + FRAME_SAMPLE_SCHEMA

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = {c: [] for c in list(keep_cols) + [
                "frame_idx", "frame_offset", "frame_len", "frame_crc32"]}
            # zip over column arrays, never pdf.iterrows(): row-at-a-time
            # pandas iteration is ~10x slower and this plumbing is the
            # template a real ffmpeg-backed sampler inherits
            carry_arrays = [pdf_[c] for c in keep_cols]
            for j, v in enumerate(pdf_[binary_col]):
                if v is None or len(v) == 0:
                    continue
                step = max(1, len(v) // n_frames)
                for fi in range(min(n_frames, len(v))):
                    off = fi * step
                    chunk = v[off:off + step]
                    for c, arr in zip(keep_cols, carry_arrays):
                        rows[c].append(arr.iloc[j])
                    rows["frame_idx"].append(fi)
                    rows["frame_offset"].append(off)
                    rows["frame_len"].append(len(chunk))
                    rows["frame_crc32"].append(_zlib.crc32(chunk))
            yield pd.DataFrame(rows)

    return df.select(*cols).mapInPandas(fn, out_schema)


RESIZE_PLAN_SCHEMA = ("orig_w int, orig_h int, out_w int, out_h int, "
                      "scale_x1000 int, resized_len int, resized binary")


def with_resize_plan(df: DataFrame, binary_col: str,
                     max_w: int, max_h: int,
                     keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Image resize PLUMBING: per-row fit-to-box planning with REAL header
    parsing and integer scale arithmetic; only the pixel transform itself
    is the declared fake (no codec libs in this container — see
    resize_image for the seam a PIL-backed cluster wires in).

    Per row: original dimensions come from the actual container headers
    (media_meta — PNG/GIF/JPEG/MP4), the fit scale is
    min(1000, max_w*1000 // w, max_h*1000 // h) in integer thousandths
    (never upscale), and out_w/out_h are the floor-scaled dimensions.
    The 'resized' payload is a DETERMINISTIC FAKE — the byte prefix of
    length len*scale/1000 — carrying the batch shape a real resizer
    produces (binary in -> binary out, same row count). Undecodable
    payloads yield null metadata and a null payload (total)."""
    from llmap_spark.media_meta import parse_media_meta

    cols = list(keep_cols) + [binary_col]
    dtypes = dict(df.dtypes)
    carry_ddl = ", ".join(f"{c} {dtypes[c]}" for c in keep_cols)
    out_schema = (carry_ddl + ", " if carry_ddl else "") + RESIZE_PLAN_SCHEMA

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = {c: [] for c in list(keep_cols) + [
                "orig_w", "orig_h", "out_w", "out_h", "scale_x1000",
                "resized_len", "resized"]}
            carry_arrays = [pdf_[c] for c in keep_cols]
            for j, v in enumerate(pdf_[binary_col]):
                for c, arr in zip(keep_cols, carry_arrays):
                    rows[c].append(arr.iloc[j])
                meta = parse_media_meta(v)
                w, h = meta.width, meta.height
                if not w or not h:
                    for k in ("orig_w", "orig_h", "out_w", "out_h",
                              "scale_x1000", "resized_len"):
                        rows[k].append(None)
                    rows["resized"].append(None)
                    continue
                scale = min(1000, (max_w * 1000) // w, (max_h * 1000) // h)
                out_w = (w * scale) // 1000
                out_h = (h * scale) // 1000
                fake = bytes(v[:max(1, (len(v) * scale) // 1000)])
                rows["orig_w"].append(w)
                rows["orig_h"].append(h)
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                rows["scale_x1000"].append(scale)
                rows["resized_len"].append(len(fake))
                rows["resized"].append(fake)
            yield pd.DataFrame(rows)

    return df.select(*cols).mapInPandas(fn, out_schema)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Image resize, REAL for every decodable format (PNG/GIF/baseline
    JPEG via decode_image -> integer nearest-neighbor resample); the
    result is RE-ENCODED AS PNG regardless of input format (lossless,
    valid CRCs — the normalize-on-resize convention every thumbnail
    pipeline uses anyway). WebP still needs a codec library absent from
    this container and raises the documented NotImplementedError; a
    decodable-but-corrupt payload raises ValueError with its typed
    status."""
    from llmap_spark.png import encode_png, resample_nearest

    img = decode_image(payload)  # raises NotImplementedError for WebP
    if img.status != "ok":
        raise ValueError(f"cannot resize: decode status {img.status!r}")
    px = resample_nearest(img.pixels, img.width, img.height,
                          img.channels, width, height)
    return encode_png(px, width, height, img.channels)


def decode_image(payload: bytes):
    """Image decode. REAL for PNG (llmap_spark.png: inflate + unfilter),
    GIF (llmap_spark.gif: pure-stdlib LZW) and baseline JPEG
    (llmap_spark.jpeg: Huffman + dequant + numpy IDCT). Only WebP's VP8
    entropy coder remains codec-bound and raises the documented
    NotImplementedError seam (progressive JPEG returns its typed
    unsupported status rather than raising — the format was recognized)."""
    from llmap_spark.gif import decode_gif
    from llmap_spark.jpeg import decode_jpeg
    from llmap_spark.png import decode_png

    img = decode_png(payload)
    if img.status != "not_png":
        return img  # total PNG path: 'ok' or a typed failure status
    gimg = decode_gif(payload)
    if gimg.status != "not_gif":
        return gimg
    jimg = decode_jpeg(payload)
    if jimg.status != "not_jpeg":
        return jimg
    raise NotImplementedError(
        "non-PNG/GIF/JPEG decode requires a codec library not present "
        "in this environment; wire PIL/torchvision here on a real "
        "cluster")


PNG_DECODE_SCHEMA = ("status string, width int, height int, channels int, "
                     "mean_x1000 int, px_md5 string")


def with_png_decode(df: DataFrame, binary_col: str,
                    keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """REAL pixel decode over a binary column: per-row PNG inflate +
    unfilter via the shared llmap_spark.png kernel, summarized as
    integer-exact stats (mean_x1000 = floor of mean pixel value x1000)
    plus the md5 of the raw decoded pixel bytes — the column the driver
    oracle hash-verifies. Total: non-PNG/corrupt rows carry their typed
    status with NULL stats. Map-only Arrow batches (map_with_carry)."""
    from llmap_spark.functions.arrow_carry import map_with_carry
    from llmap_spark.png import png_pixel_stats

    def batch(series: pd.Series) -> pd.DataFrame:
        rows = [png_pixel_stats(v) for v in series]
        return pd.DataFrame(rows, columns=["status", "width", "height",
                                           "channels", "mean_x1000",
                                           "px_md5"])

    return map_with_carry(df, binary_col, keep_cols, PNG_DECODE_SCHEMA,
                          batch)


AUDIO_DECODE_SCHEMA = ("status string, sample_rate int, channels int, "
                       "n_frames int, mean_milli long, abs_mean_milli long, "
                       "s_md5 string")


def audio_sample_stats(payload: bytes | None) -> tuple:
    """Combined WAV+FLAC sample-stats kernel: (status, sample_rate,
    channels, n_frames, mean_milli, abs_mean_milli, s_md5). WAV stats
    hash the PCM bytes as stored; FLAC (lossless — llmap_spark.flac)
    hashes the decoded interleaved int16 stream. Anything neither
    recognizes is 'undecodable' (the MP3 seam). Total."""
    import hashlib

    from llmap_spark.audio import wav_sample_stats
    from llmap_spark.flac import decode_flac

    st = wav_sample_stats(payload)
    if st[0] != "not_wav":
        return st
    a = decode_flac(payload)
    if a.status == "not_flac":
        return ("undecodable", None, None, None, None, None, None)
    if a.status != "ok":
        return (a.status, a.sample_rate, a.channels, None, None, None,
                None)
    s = np.frombuffer(a.samples, dtype="<i2").astype(np.int64)
    if s.size == 0:
        return (a.status, a.sample_rate, a.channels, 0, 0, 0,
                hashlib.md5(b"").hexdigest())
    return (a.status, a.sample_rate, a.channels, a.n_frames,
            int(s.sum()) * 1000 // s.size,
            int(np.abs(s).sum()) * 1000 // s.size,
            hashlib.md5(a.samples).hexdigest())


def with_audio_decode(df: DataFrame, binary_col: str,
                      keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """REAL audio sample decode (WAV PCM + FLAC) over a binary column:
    integer-exact amplitude stats + md5 of the sample bytes via
    audio_sample_stats. Total: unrecognized/compressed rows carry a
    typed status with NULL stats. NOTE the mean_milli floor division
    follows Python floor semantics (toward -inf); cross-engine oracles
    must plant non-negative sums (DuckDB // truncates toward zero)."""
    from llmap_spark.functions.arrow_carry import map_with_carry

    def batch(series: pd.Series) -> pd.DataFrame:
        rows = [audio_sample_stats(v) for v in series]
        return pd.DataFrame(rows, columns=["status", "sample_rate",
                                           "channels", "n_frames",
                                           "mean_milli", "abs_mean_milli",
                                           "s_md5"])

    return map_with_carry(df, binary_col, keep_cols, AUDIO_DECODE_SCHEMA,
                          batch)


def image_pixel_stats(payload: bytes | None) -> tuple:
    """Combined PNG+GIF+JPEG pixel-stats kernel: (status, width, height,
    channels, mean_x1000, px_md5). Anything no codec recognizes is
    'undecodable' (the WebP seam) — total, never raises."""
    from llmap_spark.gif import decode_gif
    from llmap_spark.jpeg import decode_jpeg
    from llmap_spark.png import pixel_stats_of, png_pixel_stats

    st = png_pixel_stats(payload)
    if st[0] != "not_png":
        return st
    for img in (decode_gif(payload), decode_jpeg(payload)):
        if img.status in ("not_gif", "not_jpeg"):
            continue
        if img.status != "ok":
            return (img.status, img.width, img.height, None, None, None)
        mean_x1000, md5_ = pixel_stats_of(img.pixels)
        return (img.status, img.width, img.height, img.channels,
                mean_x1000, md5_)
    return ("undecodable", None, None, None, None, None)


def with_image_decode(df: DataFrame, binary_col: str,
                      keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """REAL pixel decode over a binary column for all three decodable
    web formats (PNG + GIF + baseline JPEG) via image_pixel_stats; same
    schema and map-only shape as with_png_decode."""
    from llmap_spark.functions.arrow_carry import map_with_carry

    def batch(series: pd.Series) -> pd.DataFrame:
        rows = [image_pixel_stats(v) for v in series]
        return pd.DataFrame(rows, columns=["status", "width", "height",
                                           "channels", "mean_x1000",
                                           "px_md5"])

    return map_with_carry(df, binary_col, keep_cols, PNG_DECODE_SCHEMA,
                          batch)
