"""Single-process reference extractor (the oracle).

Row-at-a-time runner over the same kernel the Spark UDFs use; tests assert
the Spark plumbing preserves kernel output byte-for-byte. Modeled on the
reference's only self-contained correctness tool, the manual CLI harness
``python parse.py <skeleton|chunk|tokens> <files...>`` (reference
parse.py:254-281).

CLI:
    python -m llmap_spark.oracle blocks  <file.html> [...]
    python -m llmap_spark.oracle extract <file.html|file.pdf> [...]
    python -m llmap_spark.oracle status  <file.html|file.pdf> [...]
    python -m llmap_spark.oracle meta    <file.png|gif|jpg|wav|...> [...]
    python -m llmap_spark.oracle lang    <file.txt> [...]
    python -m llmap_spark.oracle pixels  <file.png> [...]
"""

from __future__ import annotations

import sys
from pathlib import Path

from llmap_spark import kernel


def extract_rows(pages: list[dict]) -> list[dict]:
    """pages: dicts with at least url + html(bytes). Returns the oracle's
    extracted rows in the engine output contract (FIXTURES.md §2/§3)."""
    out = []
    for p in pages:
        r = kernel.extract_page(p.get("html"))
        out.append({
            "url": p["url"],
            "warc_ts": p.get("warc_ts"),
            "lang": p.get("lang"),
            "extracted_text": r.extracted_text,
            "spans": [{"start": s, "end": e} for s, e in r.spans],
            "n_blocks_kept": r.n_blocks_kept,
            "n_blocks_total": r.n_blocks_total,
            "status": r.status,
        })
    return out


def extract_parquet(pages_path: str) -> "pyarrow.Table":  # noqa: F821
    """Run the oracle over a pages parquet file; returns a pyarrow Table of
    extracted rows sorted by url. No Spark involved."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(pages_path, columns=["url", "warc_ts", "lang", "html"])
    rows = extract_rows([
        {"url": u, "warc_ts": w, "lang": lg, "html": h}
        for u, w, lg, h in zip(
            t.column("url").to_pylist(), t.column("warc_ts").to_pylist(),
            t.column("lang").to_pylist(), t.column("html").to_pylist(),
        )
    ])
    rows.sort(key=lambda r: r["url"])
    return pa.Table.from_pylist(rows)


def _dispatch(payload: bytes):
    """Media dispatch for the CLI: PDFs take the stdlib text-layer kernel,
    everything else the HTML block kernel — the SAME extract_any the Spark
    UDF path uses."""
    from llmap_spark.functions.multimodal import extract_any

    return extract_any(payload)


def main(argv: list[str]) -> int:
    if len(argv) < 2 or argv[0] not in {"blocks", "extract", "status",
                                        "meta", "lang", "pixels"}:
        print(__doc__, file=sys.stderr)
        return 2
    cmd, files = argv[0], argv[1:]
    for f in files:
        # warn + drop nonexistent inputs (reference llmap.py:259-261)
        if not Path(f).is_file():
            print(f"warning: skipping nonexistent file {f}", file=sys.stderr)
            continue
        html = Path(f).read_bytes()
        if cmd == "blocks":
            dec = kernel.decode_html(html)
            blocks, _, _ = kernel.parse_blocks(dec.text)
            keep = kernel.classify(blocks)
            for b, k in zip(blocks, keep):
                mark = "KEEP" if k else ("cand" if b.candidate else "drop")
                print(f"{f}\t{b.idx}\t{mark}\t{b.tag}\t[{b.start}:{b.end}]\t"
                      f"tok={b.n_tokens}\tlink={b.n_link_chars}/{b.n_chars}\t"
                      f"{b.text[:60]!r}")
        elif cmd == "extract":
            r = _dispatch(html)
            print(r.extracted_text)
        elif cmd == "pixels":
            # the SAME combined PNG/GIF/JPEG kernel the Spark UDF runs
            from llmap_spark.functions.multimodal import image_pixel_stats

            st_, w, h, ch, mean, md5_ = image_pixel_stats(html)
            print(f"{f}\t{st_}\t{w}x{h}\tchannels={ch}\t"
                  f"mean_x1000={mean}\tpx_md5={md5_}")
        elif cmd == "lang":
            from llmap_spark.operators.langid import detect_language

            lang, script, n = detect_language(
                html.decode("utf-8", errors="replace"))
            print(f"{f}\t{lang}\tscript={script}\tletters={n}")
        elif cmd == "meta":
            from llmap_spark.media_meta import parse_media_meta

            m = parse_media_meta(html)
            print(f"{f}\tkind={m.kind}\twidth={m.width}\theight={m.height}\t"
                  f"bit_depth={m.bit_depth}\tsample_rate={m.sample_rate}\t"
                  f"channels={m.channels}")
        else:
            r = _dispatch(html)
            print(f"{f}\t{r.status}\tkept={r.n_blocks_kept}/{r.n_blocks_total}\t"
                  f"chars={len(r.extracted_text)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
