"""Deterministic main-content extraction kernel.

This module is the *semantics* of the whole engine; everything else is Spark
plumbing. It is pure Python, stdlib-only, total (never raises on any byte
input), and deterministic. The exact same functions run in two harnesses:

  * row-at-a-time in-process via :mod:`llmap_spark.oracle` (the reference
    extractor tests compare against), and
  * batched over pandas Series inside Arrow-vectorized Spark UDFs
    (:mod:`llmap_spark.functions.extract_udfs`).

Byte-identity of ``extracted_text`` per url between the two harnesses is the
correctness gate (BASELINE.json `north_rule`).

Design lineage (reference: jbellis/llmap, studied at /root/reference):

  * structure-aware span extraction — the reference parses source files into
    a sorted list of typed byte spans (reference ``parse.py:36-67``); we parse
    HTML into a document-ordered list of typed text blocks with char spans.
  * coarse-first funnel — the reference prunes with cheap skeletons before
    expensive full-source analysis (``llmap.py:139-174``); we gate on cheap
    per-block candidate features before density classification.
  * two-pass refine — the reference's refine stage does an answer pass plus a
    "check you didn't miss anything" follow-up (``prompts.py:104-117``); we do
    a density-classification pass plus a neighbor-rescue pass.
  * bounded per-item work — the reference truncates oversized inputs to a
    token budget (``parse.py:20-26``); we cap raw HTML at MAX_HTML_BYTES.
  * determinism-by-sorting — the reference sorts analyses so its cache is
    deterministic (``llmap.py:209-213``); our blocks are kept in document
    order and every decision rule uses integer arithmetic only.

All keep/candidate decisions use integer arithmetic (no floats) so the same
decision is reached regardless of serialization boundary (Arrow, Parquet,
JSON). Float densities are carried for inspection only.
"""

from __future__ import annotations

import codecs
import html as _htmlmod
import re
from typing import NamedTuple

# 2.4.0: lineage schema gained n_empty — the version gate exists exactly
# so a resume cannot mix lineage/extraction schemas across snapshots
# (extraction output bytes are unchanged from 2.3.0)
KERNEL_VERSION = "2.4.0"

# --- bounded per-item work (reference parse.py:20-26 analogue) ------------
MAX_HTML_BYTES = 1_000_000  # raw html byte cap per page
MAX_TEXT_BYTES = 500_000    # extracted text cap (chars; defensive)

# --- block model -----------------------------------------------------------
# Tags that open/close a visual block; seeing one flushes the current block.
_BLOCK_TAGS = frozenset({
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "html",
    "li", "main", "nav", "ol", "option", "p", "pre", "section", "select",
    "table", "tbody", "td", "tfoot", "th", "thead", "tr", "ul",
})
# Content inside these is never visible text.
_SKIP_TAGS = frozenset({
    "script", "style", "noscript", "template", "svg", "head", "iframe",
    "object", "embed", "applet", "audio", "video", "canvas", "map",
})
# Blocks nested under these are boilerplate containers (reference analogue:
# annotation-strip predicate, parse.py:55-57 — drop boilerplate node classes).
_BOILER_TAGS = frozenset({"nav", "header", "footer", "aside", "form", "select"})
# Void elements — never tracked as open.
_VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
})

# --- classification thresholds (integer-arithmetic rules) ------------------
MIN_CANDIDATE_CHARS = 16   # stage-1 coarse gate: block must have >=16 chars
MIN_KEEP_TOKENS = 8        # stage-2: kept block needs >=8 words
MIN_RESCUE_TOKENS = 3      # stage-2b neighbor rescue: >=3 words
CHARS_PER_LINE = 80        # virtual line width for text density
MIN_DENSITY_TOKENS_PER_LINE = 4  # keep needs n_tokens >= 4 * n_lines

_CHARSET_RE = re.compile(rb"""charset\s*=\s*["']?\s*([A-Za-z0-9._-]+)""")


class Block(NamedTuple):
    """One visual text block, in document order.

    ``start``/``end`` are character offsets into the *decoded* html string.
    Mirrors the reference's tree-sitter IR dicts ``{type,start,end,text}``
    sorted by start byte (reference parse.py:59-66).
    """

    idx: int
    tag: str
    depth: int
    start: int
    end: int
    text: str
    n_chars: int
    n_tokens: int
    n_link_chars: int
    in_boiler: bool
    candidate: bool


class DecodeResult(NamedTuple):
    text: str
    truncated: bool
    replaced: bool


class PageResult(NamedTuple):
    extracted_text: str
    spans: list[tuple[int, int]]
    n_blocks_kept: int
    n_blocks_total: int
    status: str


def _normalize(raw: str) -> str:
    """Whitespace-collapse a raw text run. ' '.join(split()) is the single
    normalization rule of the engine; both harnesses share it."""
    return " ".join(raw.split())


def decode_html(html: bytes | None, cap: int = MAX_HTML_BYTES) -> DecodeResult:
    """Bytes -> str, total. Cap bytes, sniff BOM then meta charset in the
    first 2 KiB, decode with errors='replace'. Fixed policy, documented in
    SURVEY §7.1. BOM wins over meta (the HTML5 encoding-sniff order):
    UTF-16 pages would otherwise decode as NUL-riddled mojibake."""
    if not html:
        return DecodeResult("", False, False)
    truncated = len(html) > cap
    if truncated:
        html = html[:cap]
    if html[:2] in (b"\xff\xfe", b"\xfe\xff"):
        # strict-first decode: 'replaced' means the DECODER substituted
        # characters, detected by the strict pass failing — scanning the
        # output for U+FFFD misreported pages that legitimately contain
        # the replacement character (re-encoded-lossily-upstream pages)
        try:  # utf-16 consumes the BOM, picks LE/BE from it
            return DecodeResult(html.decode("utf-16"), truncated, False)
        except Exception:
            pass
        try:
            text = html.decode("utf-16", errors="replace")
        except Exception:
            text = html.decode("utf-8", errors="replace")
        return DecodeResult(text, truncated, True)
    if html[:3] == b"\xef\xbb\xbf":
        html = html[3:]  # UTF-8 BOM: strip, else it prepends U+FEFF
    codec = "utf-8"
    m = _CHARSET_RE.search(html[:2048])
    if m:
        name = m.group(1).decode("ascii", "replace")
        try:
            codec = codecs.lookup(name).name
        except (LookupError, ValueError):
            codec = "utf-8"
    try:  # strict-first: see the BOM path above
        return DecodeResult(html.decode(codec), truncated, False)
    except Exception:
        pass
    try:
        text = html.decode(codec, errors="replace")
    except Exception:  # pathological codec behaviour -> fixed fallback
        text = html.decode("utf-8", errors="replace")
    return DecodeResult(text, truncated, True)


class _BlockSink:
    """Document-ordered Block accumulator driven by the tag scanner.

    Counters (not strict stacks) make unclosed/malformed tags harmless.
    Offsets are char positions into the decoded document, supplied
    directly by the scanner.
    """

    def __init__(self) -> None:
        self.blocks: list[Block] = []
        self.body_seen = False
        self._skip = 0          # depth inside _SKIP_TAGS
        self._boiler = 0        # depth inside _BOILER_TAGS
        self._anchor = 0        # depth inside <a>
        self._depth = 0         # open-element depth
        self._tag = "body"      # block tag context for the next flush
        self._pieces: list[tuple[str, bool]] = []  # (decoded text, in_link)
        self._start = -1        # char offset of first piece in current block
        self._end = -1          # char offset just past last piece

    # -- block assembly --
    def _add_piece(self, raw: str, pos: int, raw_len: int) -> None:
        if self._skip:
            return
        if self._start < 0:
            self._start = pos
        self._end = pos + raw_len
        self._pieces.append((raw, self._anchor > 0))

    def _flush(self) -> None:
        if not self._pieces:
            return
        raw = "".join(p for p, _ in self._pieces)
        # one split serves normalization AND the token count (identical to
        # _normalize + text.split(): " ".join(words).split() == words)
        words = raw.split()
        text = " ".join(words)
        if text:
            n_chars = len(text)
            if any(in_link for _, in_link in self._pieces):
                link_chars = sum(len(_normalize(p))
                                 for p, in_link in self._pieces if in_link)
                if link_chars > n_chars:
                    link_chars = n_chars
            else:
                link_chars = 0  # common case: no anchors in the block
            n_tokens = len(words)
            in_boiler = self._boiler > 0
            # stage-1 coarse candidate gate (integer arithmetic only):
            # enough chars, not link-dominated, not inside a boiler container.
            candidate = (
                n_chars >= MIN_CANDIDATE_CHARS
                and 4 * link_chars < 3 * n_chars
                and not in_boiler
            )
            self.blocks.append(Block(
                idx=len(self.blocks), tag=self._tag, depth=self._depth,
                start=self._start, end=self._end, text=text,
                n_chars=n_chars, n_tokens=n_tokens, n_link_chars=link_chars,
                in_boiler=in_boiler, candidate=candidate,
            ))
        self._pieces = []
        self._start = -1
        self._end = -1

    # -- scanner callbacks --
    def start(self, tag: str) -> None:
        if tag == "body":
            self.body_seen = True
        if tag in _BLOCK_TAGS:
            self._flush()
            self._tag = tag
        if tag == "a":
            self._anchor += 1
        if tag in _SKIP_TAGS:
            self._skip += 1
        if tag in _BOILER_TAGS:
            self._boiler += 1
        if tag not in _VOID_TAGS:
            self._depth += 1

    def end(self, tag: str) -> None:
        if tag in _BLOCK_TAGS:
            self._flush()
            self._tag = tag
        if tag == "a" and self._anchor:
            self._anchor -= 1
        if tag in _SKIP_TAGS and self._skip:
            self._skip -= 1
        if tag in _BOILER_TAGS and self._boiler:
            self._boiler -= 1
        if tag not in _VOID_TAGS and self._depth:
            self._depth -= 1

    def startend(self, tag: str) -> None:
        if tag in _BLOCK_TAGS:
            self._flush()
            self._tag = tag

    def data(self, pos: int, raw: str) -> None:
        if raw:
            # entity decode only when present (html.unescape is regex-based
            # and worth skipping for the common entity-free run)
            decoded = _htmlmod.unescape(raw) if "&" in raw else raw
            self._add_piece(decoded, pos, len(raw))


# start-tag tail: attributes with quote-aware '>' detection; '/>' included
_TAG_TAIL_RE = re.compile(r"""[^>"']*(?:"[^"]*"[^>"']*|'[^']*'[^>"']*)*>""")
_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:_.-]*")
# content of these elements is raw text: '<' inside does not open tags
_RAWTEXT_TAGS = frozenset({"script", "style", "textarea", "title", "xmp"})
# ASCII-only lowercase map: LENGTH-PRESERVING, unlike str.lower() (e.g.
# U+0130 'İ' lowercases to 2 chars), so offsets into the lowered copy stay
# aligned with the original document. Tag names are ASCII by definition.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")
# chars that may legally precede the '/' of a self-closing '/>' — after a
# quoted value or whitespace. A '/' right after an unquoted attribute value
# (e.g. <a href=/x/>) is part of the value per HTML5, not self-closing.
_PRE_SLASH_OK = frozenset(" \t\n\r\f\"'")
# Elements where the self-closing slash is HONORED: void elements (no-op
# either way) and foreign-content roots (SVG/MathML follow XML rules). On
# every other element HTML5 IGNORES the slash — '<script src=x/>' OPENS a
# script whose body must stay invisible; treating it as self-closed leaked
# the JS into extracted text.
_FOREIGN_TAGS = frozenset({"svg", "math"})


def _scan(doc: str, sink: _BlockSink) -> None:
    """Single-pass, quote-aware HTML tokenizer driving the sink.

    Replaces html.parser (v1 kernel): str.find / compiled-regex driven,
    ~4x faster on real pages, and offsets are native (no line/col
    bookkeeping). Tolerant by construction: anything unrecognized after
    '<' is treated as text; unterminated constructs run to end-of-doc.
    """
    low = doc.translate(_ASCII_LOWER)  # case-insensitive tag searches, offset-aligned
    n = len(doc)
    pos = 0
    while pos < n:
        lt = doc.find("<", pos)
        if lt < 0:
            sink.data(pos, doc[pos:n])
            break
        if lt > pos:
            sink.data(pos, doc[pos:lt])
        nxt = doc[lt + 1:lt + 2]
        if nxt == "!":
            if doc.startswith("<!--", lt):
                # HTML5 "abrupt closing of an empty comment": '<!-->' and
                # '<!--->' are COMPLETE comments whose closer overlaps the
                # opener — searching for '-->' past them used to swallow
                # the whole rest of the document under status 'ok'
                if doc.startswith(">", lt + 4):
                    pos = lt + 5
                elif doc.startswith("->", lt + 4):
                    pos = lt + 6
                else:
                    e = doc.find("-->", lt + 4)
                    pos = n if e < 0 else e + 3
            else:
                e = doc.find(">", lt + 2)
                pos = n if e < 0 else e + 1
            continue
        if nxt == "?":
            e = doc.find(">", lt + 2)
            pos = n if e < 0 else e + 1
            continue
        if nxt == "/":
            m = _NAME_RE.match(low, lt + 2)
            if m is None:  # "</" followed by junk -> text
                sink.data(lt, doc[lt:lt + 2])
                pos = lt + 2
                continue
            tag = m.group(0)
            e = doc.find(">", m.end())
            sink.end(tag)
            pos = n if e < 0 else e + 1
            continue
        m = _NAME_RE.match(low, lt + 1)
        if m is None:  # bare '<' -> text
            sink.data(lt, doc[lt:lt + 1])
            pos = lt + 1
            continue
        tag = m.group(0)
        tail = _TAG_TAIL_RE.match(doc, m.end())
        if tail is not None:
            end_pos = tail.end()
        else:
            # quote-aware match failed: a stray quote in an unquoted
            # attribute value (title=don't — legal per HTML5) or an
            # unclosed quote. Degrade to the naive next-'>' close instead
            # of dropping the rest of the document (previously a silent
            # whole-page loss with status 'ok').
            gt = doc.find(">", m.end())
            end_pos = n if gt < 0 else gt + 1
        self_closing = doc[end_pos - 2:end_pos - 1] == "/" and (
            end_pos - 2 == m.end()  # '/' directly after the tag name: <br/>
            or doc[end_pos - 3] in _PRE_SLASH_OK)
        if self_closing and (tag in _VOID_TAGS or tag in _FOREIGN_TAGS):
            sink.startend(tag)
        else:
            # non-void self-closing: HTML5 ignores the slash — the element
            # OPENS (counters tolerate it never closing)
            sink.start(tag)
            if tag in _RAWTEXT_TAGS:
                # close tag must be followed by whitespace, '/', '>' or
                # EOF (HTML5): '</scriptable>' must NOT close <script> —
                # matching the bare prefix leaked script source as text
                search = end_pos
                close = -1
                target = "</" + tag
                while True:
                    close = low.find(target, search)
                    if close < 0:
                        break
                    after = low[close + len(target):close + len(target) + 1]
                    if after in ("", ">", "/", " ", "\t", "\n", "\r", "\f"):
                        break
                    search = close + 1
                if close < 0:
                    sink.end(tag)  # unterminated raw text: skip to EOF
                    break
                gt = doc.find(">", close + 2 + len(tag))
                sink.end(tag)
                end_pos = n if gt < 0 else gt + 1
        pos = end_pos


def parse_blocks(doc: str) -> tuple[list[Block], bool, bool]:
    """Decoded html -> (blocks in document order, body_seen, parse_error).

    Total: any scanner exception yields ([], body_seen, True) rather than
    raising (reference analogue: exceptions-as-data, exceptions.py:1-29 —
    a throwing Arrow UDF would kill the whole task batch).
    """
    sink = _BlockSink()
    try:
        _scan(doc, sink)
        sink._flush()
    except Exception:
        return [], sink.body_seen, True
    return sink.blocks, sink.body_seen, False


def classify(blocks: list[Block]) -> list[bool]:
    """Stage-2 keep flags: density classification + neighbor rescue.

    Pass 1 (Boilerpipe-style, integer arithmetic):
      keep iff candidate AND n_tokens >= MIN_KEEP_TOKENS
               AND 3*n_link_chars <= n_chars            (link density <= 1/3)
               AND n_tokens >= MIN_DENSITY_TOKENS_PER_LINE * ceil(n_chars/80)

    Pass 2 (neighbor rescue; mirrors the reference's two-pass refine,
    prompts.py:104-117): a dropped candidate block sandwiched between two
    pass-1-kept blocks is rescued if it has >= MIN_RESCUE_TOKENS words and
    link density <= 1/3. Rescue reads only pass-1 flags, so it is a single
    deterministic pass.
    """
    base: list[bool] = []
    for b in blocks:
        lines = (b.n_chars + CHARS_PER_LINE - 1) // CHARS_PER_LINE
        keep = (
            b.candidate
            and b.n_tokens >= MIN_KEEP_TOKENS
            and 3 * b.n_link_chars <= b.n_chars
            and b.n_tokens >= MIN_DENSITY_TOKENS_PER_LINE * lines
        )
        base.append(keep)
    out = list(base)
    n = len(blocks)
    for i, b in enumerate(blocks):
        if (
            not base[i]
            and 0 < i < n - 1
            and base[i - 1]
            and base[i + 1]
            and b.candidate
            and b.n_tokens >= MIN_RESCUE_TOKENS
            and 3 * b.n_link_chars <= b.n_chars
        ):
            out[i] = True
    return out


def stitch(blocks: list[Block], keep: list[bool]) -> tuple[str, list[tuple[int, int]]]:
    """Stage-3: join kept blocks in document order with a blank line; emit
    char spans. Document order is what makes stitching byte-deterministic
    (reference analogue: IR sort by start byte, parse.py:66).

    When the text cap truncates, the spans list is truncated CONSISTENTLY:
    only blocks whose text fully fits are listed, so spans never reference
    dropped content (consumers align text against spans)."""
    kept = [b for b, k in zip(blocks, keep) if k]
    text = "\n\n".join(b.text for b in kept)
    if len(text) <= MAX_TEXT_BYTES:
        return text, [(b.start, b.end) for b in kept]
    text = text[:MAX_TEXT_BYTES]
    spans: list[tuple[int, int]] = []
    acc = 0
    for b in kept:
        end = acc + len(b.text)
        if end > MAX_TEXT_BYTES:
            break
        spans.append((b.start, b.end))
        acc = end + 2  # the "\n\n" separator
    return text, spans


def page_status(html: bytes | None, dec: DecodeResult, body_seen: bool,
                parse_error: bool) -> str:
    """Single status column, fixed precedence (documented contract):
    empty > parse_error > truncated > decode_replaced > no_body > ok."""
    if not html or not dec.text.strip():
        return "empty"
    if parse_error:
        return "parse_error"
    if dec.truncated:
        return "truncated"
    if dec.replaced:
        return "decode_replaced"
    if not body_seen:
        return "no_body"
    return "ok"


def has_candidates(blocks: list[Block]) -> bool:
    """Stage-1 funnel gate: any candidate block -> page survives to stage 2
    (reference analogue: coarse relevance semi-join, llmap.py:155-158)."""
    return any(b.candidate for b in blocks)


def extract_page(html: bytes | None) -> PageResult:
    """Full per-page extraction: decode -> parse -> gate -> classify -> stitch.

    This composition is exactly what the staged Spark pipeline computes; the
    oracle and the fused fast path both call it directly.
    """
    dec = decode_html(html)
    blocks, body_seen, perr = parse_blocks(dec.text)
    status = page_status(html, dec, body_seen, perr)
    if not has_candidates(blocks):
        # funnel short-circuit: no candidate blocks -> stage 2/3 skipped
        return PageResult("", [], 0, len(blocks), status)
    keep = classify(blocks)
    text, spans = stitch(blocks, keep)
    return PageResult(text, spans, sum(keep), len(blocks), status)
