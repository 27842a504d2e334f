"""Seeded synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).

Wraps `/root/testdata/sf*/documents.parquet` text in templated HTML
boilerplate (nav/header/sidebar/footer/ads around main-content paragraphs),
with a Zipf-skewed host pool so salting is exercised, plus edge-case rows at
fixed periodic indices. Fully deterministic: per-page ``random.Random(SEED+i)``,
no wall clock, no external data. Pure pyarrow — no Spark needed to generate.

Layout invariants the test/oracle suite relies on:
  * page index ``i`` for ``i < ndocs`` uses template 0 ("plain": the whole
    document text in a single <p>), so extracted_text == normalized doc text
    for those pages — the SQL-expressible roundtrip oracle.
  * edge-case pages are exactly those with ``i % 1000 in EDGE_RESIDUES``.
  * url encodes template, doc id and page index: https://{host}/t{T}/d{D}/p{I}
"""

from __future__ import annotations

import html as _htmlmod
import random
from datetime import datetime, timedelta
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

CORPUS_VERSION = "1.3.1"
SEED = 42
EPOCH = datetime(2025, 1, 1)

# residue (mod 1000) -> edge kind
EDGE_RESIDUES = {
    7: "empty", 13: "no_body", 17: "all_links", 23: "malformed",
    29: "oversized", 31: "non_utf8", 37: "ws_only",
}
N_TEMPLATES = 8
HOT_HOSTS = ["news.example.com", "blog.example.org", "portal.example.net"]

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _host(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.20:
        return HOT_HOSTS[0]
    if r < 0.35:
        return HOT_HOSTS[1]
    if r < 0.45:
        return HOT_HOSTS[2]
    return f"site-{rng.randrange(2000)}.example.io"


def _nav(n_items: int) -> str:
    items = "".join(
        f'<li><a href="/{w}">{w.title()}</a></li>'
        for w in ("home", "world", "sports", "tech", "about", "contact")[:n_items]
    )
    return f"<nav><ul>{items}</ul></nav>"


def _sidebar(n_ads: int) -> str:
    ads = "".join(
        f'<div class="ad"><a href="/ad{k}">Sponsored link {k} buy now</a></div>'
        for k in range(n_ads)
    )
    return f'<aside><h3>Trending</h3>{ads}<a href="/more">More stories</a></aside>'


def _footer() -> str:
    links = " | ".join(f'<a href="/{w}">{w}</a>' for w in ("privacy", "terms", "rss", "jobs"))
    return f"<footer><p>{links}</p><p>&copy; 2025 Example Media Group</p></footer>"


def _paragraphs(text: str, k: int) -> list[str]:
    words = text.split()
    if not words:
        return []
    k = max(1, min(k, len(words)))
    step = (len(words) + k - 1) // k
    return [" ".join(words[j:j + step]) for j in range(0, len(words), step)]


def _page_html(i: int, tpl: int, doc_text: str, rng: random.Random) -> bytes:
    """Template html for page i. All STRUCTURAL counts (paragraph split,
    nav items, sidebar ads) are pure arithmetic in ``i`` — NOT rng draws —
    so the driver's SQL oracle can derive every template's block layout
    and extracted text from (doc_id, page index) alone (the
    extract_tpl_full oracle; rng remains only in the host pool, which
    extraction never reads)."""
    esc = _htmlmod.escape
    title = " ".join(doc_text.split()[:3]) or "untitled page"
    if tpl == 0:
        # plain template: whole doc text in ONE <p>; 3-word <h1> (dropped by
        # the <8-token rule) -> extracted_text == normalized doc text.
        body = f"<h1>{esc(title)}</h1><p>{esc(doc_text)}</p>"
        doc = ("<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
               f"<title>{esc(title)}</title></head><body><main>{body}</main>"
               "</body></html>")
        return doc.encode("utf-8")
    paras = _paragraphs(doc_text, 1 + i % 5)
    main = "".join(f"<p>{esc(p)}</p>" for p in paras)
    if tpl in (3, 5) and len(paras) > 1:
        # interleave a short link paragraph to exercise drop/rescue rules
        main = f"<p>{esc(paras[0])}</p><p><a href=\"/read\">Read more here today</a></p>" + \
               "".join(f"<p>{esc(p)}</p>" for p in paras[1:])
    parts = ["<!DOCTYPE html><html><head><meta charset=\"utf-8\">",
             f"<title>{esc(title)}</title>",
             "<script>var x=1;function f(){return 'no text here';}</script>",
             "<style>.ad{color:red}</style></head><body>"]
    parts.append(f"<header><h1>{esc(title)}</h1>{_nav(3 + i % 4)}</header>")
    if tpl % 3 == 1:
        parts.append(_sidebar(2 + i % 3))
    parts.append(f"<main><article>{main}</article></main>")
    if tpl % 3 == 2:
        parts.append(_sidebar(2 + i % 3))
    parts.append(_footer())
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def _edge_html(kind: str, doc_text: str) -> bytes:
    esc = _htmlmod.escape
    if kind == "empty":
        return b""
    if kind == "no_body":
        return f"<p>{esc(doc_text)}</p>".encode("utf-8")
    if kind == "all_links":
        links = "".join(f'<p><a href="/l{k}">link number {k} click</a></p>' for k in range(20))
        return f"<html><body>{links}</body></html>".encode("utf-8")
    if kind == "malformed":
        return (f"<html><body><div><p>{esc(doc_text)}<p>unclosed <b>tags "
                "<a href=/x>dangling</body>").encode("utf-8")
    if kind == "oversized":
        para = f"<p>{esc(doc_text)} oversized filler paragraph repeated.</p>"
        n = 1_200_000 // max(1, len(para)) + 1
        return (f"<html><body>{para * n}</body></html>").encode("utf-8")
    if kind == "non_utf8":
        return (b"<html><body><p>caf\xe9 na\xefve r\xe9sum\xe9 latin-1 bytes "
                + esc(doc_text).encode("latin-1", "replace") + b"</p></body></html>")
    if kind == "ws_only":
        return b"<html><body>   \n\t  <p>   </p>\n </body></html>"
    raise ValueError(kind)


def generate_pages(sf_dir: str, out_path: str, pages_per_doc: int | None = None,
                   batch_rows: int = 1000, n_files: int = 32) -> str:
    """Generate the pages table for one scale tier as a DIRECTORY of
    `n_files` parquet part files (WARC-segment-like layout: a single fat
    file would cap Spark's scan parallelism at a handful of row-group
    splits). Deterministic in (sf_dir contents, pages_per_doc, n_files).
    Returns out_path (the directory)."""
    docs = pq.read_table(Path(sf_dir) / "documents.parquet",
                         columns=["doc_id", "text", "lang"])
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    ndocs = len(doc_ids)
    if pages_per_doc is None:
        # uniform x10 across tiers so the arithmetic oracle (status counts
        # etc.) can derive the page count from the documents table alone
        pages_per_doc = 10
    n_pages = ndocs * pages_per_doc

    out = Path(out_path)
    out.mkdir(parents=True, exist_ok=True)
    per_file = (n_pages + n_files - 1) // n_files
    file_idx = 0
    writer = pq.ParquetWriter(out / f"part-{file_idx:05d}.parquet",
                              PAGES_SCHEMA, compression="zstd")
    written_in_file = 0
    rows: list[dict] = []

    def _flush(w, pending):
        if pending:
            w.write_table(pa.Table.from_pylist(pending, schema=PAGES_SCHEMA))
        return []

    try:
        for i in range(n_pages):
            rng = random.Random(SEED * 1_000_003 + i)
            d = i % ndocs
            doc_text = texts[d] or ""
            # page lang == doc lang EXACTLY (null for null): a page-index-
            # dependent fallback would silently drift every lang-selecting
            # oracle (extract_t0_full/extract_tpl_full read documents.lang)
            # the moment a fixture tier ships a null-lang doc
            lang = langs[d]
            tpl = (i // ndocs) % N_TEMPLATES
            kind = EDGE_RESIDUES.get(i % 1000)
            host = _host(rng)
            if kind is not None:
                url = f"https://{host}/edge/{kind}/p{i}"
                html = _edge_html(kind, doc_text)
            else:
                url = f"https://{host}/t{tpl}/d{doc_ids[d]}/p{i}"
                html = _page_html(i, tpl, doc_text, rng)
            rows.append({
                "url": url,
                "warc_ts": EPOCH + timedelta(seconds=i * 7),
                "html": html,
                "text": doc_text,
                "lang": lang,
            })
            written_in_file += 1
            if len(rows) >= batch_rows:
                rows = _flush(writer, rows)
            if written_in_file >= per_file and i + 1 < n_pages:
                rows = _flush(writer, rows)
                writer.close()
                file_idx += 1
                writer = pq.ParquetWriter(
                    out / f"part-{file_idx:05d}.parquet",
                    PAGES_SCHEMA, compression="zstd")
                written_in_file = 0
        rows = _flush(writer, rows)
    finally:
        writer.close()
    return str(out)


def pages_path_for(sf_dir: str, cache_root: str = "/root/repo/.cache/pages",
                   pages_per_doc: int | None = None) -> str:
    """Memoized generation: one parquet per (sf tier, corpus version).

    Concurrency-safe the same way the snapshot sink is: generation writes
    into a per-process tmp directory and commits with an atomic rename —
    two cold-cache processes (e.g. pytest and bench launched together)
    previously interleaved writes into the SAME part files."""
    import os
    import shutil

    tier = Path(sf_dir).name or "sf"
    tag = f"{tier}-v{CORPUS_VERSION}" + (
        f"-ppd{pages_per_doc}" if pages_per_doc is not None else "")
    out = Path(cache_root) / tag / "pages.parquet"
    marker = out.with_suffix(".parquet.done")
    if marker.exists() and out.exists():
        return str(out)
    if out.exists():  # un-markered partial from a crashed run
        shutil.rmtree(out, ignore_errors=True)
    tmp = out.parent / f".tmp-{os.getpid()}-pages.parquet"
    generate_pages(sf_dir, str(tmp), pages_per_doc=pages_per_doc)
    try:
        os.rename(tmp, out)
    except OSError:
        # another process committed first; its output is identical
        # (deterministic generator) — keep theirs
        shutil.rmtree(tmp, ignore_errors=True)
    marker.write_text(CORPUS_VERSION)
    return str(out)
