"""Extraction-stage UDFs: the Spark-facing adapters for the kernel.

Stage mapping to the reference funnel (SURVEY.md §2):
  stage 1 "coarse"  — html -> block IR + candidate features
                      (reference: skeleton extraction, parse.py:192-234)
  stage 2+3 "refine"— density classify + neighbor rescue, then stitch kept
                      blocks into (extracted_text, spans)
                      (reference: full_source_relevance prompts.py:42-69 +
                       refine_context prompts.py:72-118)

Stage 2 and 3 are separate kernel functions but fused into ONE mapInPandas
here: they both consume the block array, and keeping them in a single Python
round-trip halves the JVM<->Arrow transfer of the (large) block structs.
The funnel boundary that matters for scale — cheap gate before expensive
refine — stays explicit in the plan (plans/pipeline.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from llmap_spark import kernel

# --- schemas (DDL strings keep this importable without a session) ---------
BLOCK_DDL = (
    "idx int, tag string, depth int, start long, end long, text string, "
    "n_chars int, n_tokens int, n_link_chars int, "
    "in_boiler boolean, candidate boolean"
)
SPAN_DDL = "start long, end long"
# SQL type literal for the block array (for cast expressions in the plan)
BLOCK_ARRAY_SQL = "array<struct<" + ",".join(
    f.strip().replace(" ", ":", 1) for f in BLOCK_DDL.split(",")) + ">>"

STAGE1_SCHEMA = (
    "url string, warc_ts timestamp, lang string, "
    f"blocks array<struct<{BLOCK_DDL}>>, "
    "n_blocks_total int, n_candidates int, status string, bytes_in long"
)

EXTRACTED_CORE = (
    "url string, warc_ts timestamp, lang string, extracted_text string, "
    f"spans array<struct<{SPAN_DDL}>>, "
    "n_blocks_kept int, n_blocks_total int, status string"
)
REFINE_SCHEMA = EXTRACTED_CORE + ", bytes_in long"
FUSED_SCHEMA = REFINE_SCHEMA


def _block_to_dict(b: kernel.Block) -> dict[str, Any]:
    d = b._asdict()
    # non-candidate blocks can never be kept (classify pass-1 AND the
    # neighbor rescue both require `candidate`), so their text never
    # reaches stitch — ship features only, not payload. Cuts the staged
    # path's Arrow traffic roughly in half on boilerplate-heavy pages.
    if not b.candidate:
        d["text"] = ""
    return d


def _dict_to_block(d: dict[str, Any]) -> kernel.Block:
    return kernel.Block(
        idx=int(d["idx"]), tag=d["tag"], depth=int(d["depth"]),
        start=int(d["start"]), end=int(d["end"]), text=d["text"],
        n_chars=int(d["n_chars"]), n_tokens=int(d["n_tokens"]),
        n_link_chars=int(d["n_link_chars"]), in_boiler=bool(d["in_boiler"]),
        candidate=bool(d["candidate"]),
    )


def stage1_coarse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: pages batch -> block IR + coarse features.

    Never raises per row: malformed pages yield status columns, not
    exceptions (a throwing Arrow UDF kills the whole task batch —
    reference analogue: exceptions-as-data, exceptions.py:1-29).
    """
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "url", "warc_ts", "lang", "blocks", "n_blocks_total",
            "n_candidates", "status", "bytes_in")}
        for url, ts, lang, html in zip(
                pdf["url"], pdf["warc_ts"], pdf["lang"], pdf["html"]):
            dec = kernel.decode_html(html)
            blocks, body_seen, perr = kernel.parse_blocks(dec.text)
            status = kernel.page_status(html, dec, body_seen, perr)
            out["url"].append(url)
            out["warc_ts"].append(ts)
            out["lang"].append(lang)
            out["blocks"].append([_block_to_dict(b) for b in blocks])
            out["n_blocks_total"].append(len(blocks))
            out["n_candidates"].append(sum(1 for b in blocks if b.candidate))
            out["status"].append(status)
            out["bytes_in"].append(len(html) if html is not None else 0)
        yield pd.DataFrame(out)


def refine_stitch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel over stage-1 survivors: classify + stitch."""
    for pdf in batches:
        texts, spans_col, kept_col = [], [], []
        for blist in pdf["blocks"]:
            blocks = [_dict_to_block(d) for d in blist]
            keep = kernel.classify(blocks)
            text, spans = kernel.stitch(blocks, keep)
            texts.append(text)
            spans_col.append([{"start": s, "end": e} for s, e in spans])
            kept_col.append(sum(keep))
        yield pd.DataFrame({
            "url": pdf["url"], "warc_ts": pdf["warc_ts"], "lang": pdf["lang"],
            "extracted_text": texts, "spans": spans_col,
            "n_blocks_kept": kept_col, "n_blocks_total": pdf["n_blocks_total"],
            "status": pdf["status"], "bytes_in": pdf["bytes_in"],
        })


SPAN_PA_TYPE = None  # built lazily (pyarrow import kept out of module import)


def extract_fused_arrow(batches):
    """mapInArrow fused fast path: the whole funnel in one Python pass;
    the batch never becomes a pandas DataFrame — input html is read straight
    off the Arrow buffer, passthrough columns (url/warc_ts/lang/
    salt_bucket) are forwarded zero-copy, and outputs are built as Arrow
    arrays directly. Saves the pandas Series/DataFrame round-trip per
    batch on both sides of the UDF."""
    import pyarrow as pa

    global SPAN_PA_TYPE
    if SPAN_PA_TYPE is None:
        SPAN_PA_TYPE = pa.list_(pa.struct(
            [("start", pa.int64()), ("end", pa.int64())]))

    for rb in batches:
        names = rb.schema.names
        col = {n: rb.column(i) for i, n in enumerate(names)}
        texts, spans, kept, total, status, bytes_in = [], [], [], [], [], []
        for h in col["html"].to_pylist():
            r = kernel.extract_page(h)
            texts.append(r.extracted_text)
            spans.append([{"start": s, "end": e} for s, e in r.spans])
            kept.append(r.n_blocks_kept)
            total.append(r.n_blocks_total)
            status.append(r.status)
            bytes_in.append(len(h) if h is not None else 0)
        yield pa.RecordBatch.from_arrays(
            [col["url"], col["warc_ts"], col["lang"],
             pa.array(texts, pa.string()),
             pa.array(spans, SPAN_PA_TYPE),
             pa.array(kept, pa.int32()), pa.array(total, pa.int32()),
             pa.array(status, pa.string()),
             pa.array(bytes_in, pa.int64()),
             col["salt_bucket"]],
            names=["url", "warc_ts", "lang", "extracted_text", "spans",
                   "n_blocks_kept", "n_blocks_total", "status", "bytes_in",
                   "salt_bucket"])


# (a pandas-based fused variant existed before extract_fused_arrow; it was
# strictly slower — mapInArrow replaced it and the staged path remains the
# mapInPandas reference implementation)
