"""Stdlib-only PDF text extraction kernel (+ a deterministic generator).

Replaces the round-1 `extract_pdf_text` stub: no PDF library ships in this
container, but the text layer of crawl-style PDFs is reachable with pure
stdlib — locate stream objects, FlateDecode them with zlib, and read the
text-show operators (Tj / TJ / ' / ") inside BT..ET blocks in content-stream
order. Same contract as the HTML kernel (llmap_spark.kernel): TOTAL (never
raises on any byte input), deterministic, pure functions shared verbatim by
the single-process oracle and the Spark UDFs (reference-shape analogue: the
per-filetype parse dispatch, reference parse.py:236-240).

Deliberate scope (documented, not hidden): text-layer extraction only —
literal and hex strings in the standard escapes, FlateDecode or raw streams,
UTF-16BE (BOM-tagged) hex strings, and /ToUnicode CMap remapping for the
common Identity-H/CID case (bfchar + bfrange, both scalar and array dst
forms; all ToUnicode maps of a document are merged — per-font Tf tracking
is out of scope, fine for the overwhelmingly common one-embedded-font crawl
PDF). No encrypted PDFs, no image OCR; such payloads extract as empty
text, never an exception.

`make_pdf` is the matching deterministic generator used by tests and the
driver roundtrip query: make_pdf(text) -> extract_pdf_text -> the
whitespace-normalized text, byte-exact. It deliberately exercises both
stream codings and both string codings.
"""

from __future__ import annotations

import re
import zlib

MAX_PDF_BYTES = 8_000_000   # raw payload cap (bounded per-item work)
MAX_STREAM_BYTES = 4_000_000  # per decoded stream (zip-bomb guard)
MAX_TOTAL_STREAM_BYTES = 32_000_000  # across all streams of one payload
MAX_PDF_TEXT_CHARS = 500_000  # extracted-text cap (= kernel.MAX_TEXT_BYTES)

# bytes that may precede/follow a BT/ET operator token (PDF delimiters and
# whitespace); 'MARKET' must not read as an ET token
_TOKEN_BOUNDARY = b"\x00\t\n\x0c\r ()<>[]{}/%"

# operators of interest inside a text block (strings are scanned manually —
# PDF literal strings may contain BALANCED unescaped parens, beyond regex)
_OP_RE = re.compile(rb"Tj|TJ|T\*|'|\"")


def _is_token_at(content: bytes, i: int, tok: bytes) -> bool:
    """True when content[i:i+len(tok)] is `tok` delimited as a standalone
    PDF token (whitespace/delimiter or boundary on both sides)."""
    if content[i:i + len(tok)] != tok:
        return False
    before = content[i - 1:i]
    after = content[i + len(tok):i + len(tok) + 1]
    return ((not before or before in _TOKEN_BOUNDARY or before[0] in _TOKEN_BOUNDARY)
            and (not after or after in _TOKEN_BOUNDARY or after[0] in _TOKEN_BOUNDARY))


def _find_block_end(content: bytes, i: int) -> int:
    """Position of the ET token closing a BT block, STRING-AWARE: 'ET'
    bytes inside literal/hex strings or inline dicts (MARKET, NET, GET...)
    are operand data, not the operator — a raw find() truncated the block
    at the first such word and lost its text. Unterminated blocks run to
    end (total)."""
    n = len(content)
    while i < n:
        c = content[i]
        if c == 0x28:  # ( literal string
            _, i = _scan_literal(content, i)
            continue
        if c == 0x3C:
            if content[i + 1:i + 2] == b"<":
                i = _skip_dict(content, i)
            else:
                j = content.find(b">", i + 1)
                i = n if j < 0 else j + 1
            continue
        if c == 0x45 and _is_token_at(content, i, b"ET"):  # 'E'
            return i
        i += 1
    return n


def _text_blocks(content: bytes) -> list[bytes]:
    """BT..ET spans via linear, string-aware scanning. NOT a regex:
    `BT(.*?)ET` backtracks from every unmatched BT — O(n^2) on adversarial
    streams. BT/ET must be standalone tokens (word boundaries), and ET is
    searched outside string/dict operands. An unterminated final BT runs
    to end-of-stream (total)."""
    out = []
    pos = 0
    n = len(content)
    while pos < n:
        s = content.find(b"BT", pos)
        if s < 0:
            break
        if not _is_token_at(content, s, b"BT"):
            pos = s + 2
            continue
        e = _find_block_end(content, s + 2)
        out.append(content[s + 2:e])
        pos = e + 2
    return out

_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
        b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape_literal(body: bytes) -> bytes:
    """PDF literal-string unescape: named escapes, 1-3 digit octal, and
    line continuations (backslash-newline erases both)."""
    out = bytearray()
    i, n = 0, len(body)
    while i < n:
        c = body[i:i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = body[i + 1:i + 2]
        if nxt in _ESC:
            out += _ESC[nxt]
            i += 2
        elif nxt and nxt in b"01234567":
            # up to three octal digits; high-order overflow ignored
            # (ISO 32000: \777 -> 0xFF, never a spurious literal digit)
            j = i + 1
            while j < min(i + 4, n) and body[j:j + 1] in b"01234567":
                j += 1
            out.append(int(body[i + 1:j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):
            i += 2
            if nxt == b"\r" and body[i:i + 1] == b"\n":
                i += 1
        else:  # lone backslash before any other char: drop the backslash
            out += nxt
            i += 2
    return bytes(out)


def _decode_string(raw: bytes, cmap: dict[int, str] | None = None) -> str:
    """String object bytes -> str. Precedence:

    1. UTF-16BE when BOM-tagged (the standard PDF convention);
    2. the document's merged /ToUnicode CMap, applied when the bytes are
       2-byte aligned and EVERY 2-byte code is in the map — the all-codes
       rule keeps plain hex-ASCII strings in CMap-carrying documents from
       being corrupted by a partial mapping (deterministic fallback);
    3. PDFDocEncoding approximated as latin-1 (exact for ASCII, which is
       what font-unencoded simple PDFs carry)."""
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be", errors="replace")
        except Exception:
            return ""
    if cmap and len(raw) % 2 == 0 and raw:
        codes = [int.from_bytes(raw[i:i + 2], "big")
                 for i in range(0, len(raw), 2)]
        if all(c in cmap for c in codes):
            return "".join(cmap[c] for c in codes)
    return raw.decode("latin-1", errors="replace")


# ToUnicode CMap sections; entry COUNT and per-entry dst SIZE are both
# bounded (totality: an adversarial CMap cannot allocate unbounded
# executor memory — a multi-MB dst hex string replicated across a 64k
# bfrange would otherwise expand to dst_len x range_size characters)
MAX_CMAP_ENTRIES = 65_536
MAX_CMAP_DST_CHARS = 16  # real ToUnicode entries map to 1-2 code points
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_RANGE_ARR_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[(?:\s*<[0-9A-Fa-f]+>)+\s*\]"
    rb"|<[0-9A-Fa-f]+>)")


def _hex_to_text(h: bytes) -> str:
    """CMap dst hex -> unicode text (UTF-16BE per the ToUnicode spec),
    capped at MAX_CMAP_DST_CHARS (see the bound note above)."""
    if len(h) % 2:
        h += b"0"
    b = bytes.fromhex(h.decode("ascii"))
    if len(b) % 2:
        b += b"\x00"
    return b.decode("utf-16-be", errors="replace")[:MAX_CMAP_DST_CHARS]


def _parse_cmap(body: bytes, cmap: dict[int, str]) -> None:
    """Merge one ToUnicode CMap stream's bfchar/bfrange entries into
    `cmap`. Total: malformed entries are skipped, entry count is capped."""
    for m in _BFCHAR_RE.finditer(body):
        toks = _HEX_RE.findall(m.group(1))
        for i in range(0, len(toks) - 1, 2):
            if len(cmap) >= MAX_CMAP_ENTRIES:
                return
            src = toks[i]
            if len(src) > 8:
                continue
            cmap[int(src, 16)] = _hex_to_text(toks[i + 1])
    for m in _BFRANGE_RE.finditer(body):
        for rm in _RANGE_ARR_RE.finditer(m.group(1)):
            lo, hi = int(rm.group(1), 16), int(rm.group(2), 16)
            if hi < lo:
                continue
            hi = min(hi, lo + MAX_CMAP_ENTRIES)  # bound a hostile range
            dst = rm.group(3)
            if dst.startswith(b"["):
                dsts = _HEX_RE.findall(dst)
                for k, d in enumerate(dsts):
                    if len(cmap) >= MAX_CMAP_ENTRIES or lo + k > hi:
                        break
                    cmap[lo + k] = _hex_to_text(d)
            else:
                text0 = _hex_to_text(dst[1:-1])
                if not text0:
                    continue
                for k in range(hi - lo + 1):
                    if len(cmap) >= MAX_CMAP_ENTRIES:
                        return
                    # scalar dst increments the LAST code point (spec rule);
                    # increments landing in the UTF-16 surrogate gap
                    # (D800-DFFF) or past U+10FFFF map to U+FFFD — chr() of
                    # a lone surrogate is storable in a Python str but
                    # CRASHES at the Arrow/UTF-8 boundary, violating the
                    # kernels-never-raise invariant
                    cp = ord(text0[-1]) + k
                    if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                        cp = 0xFFFD
                    cmap[lo + k] = text0[:-1] + chr(cp)


def _scan_literal(block: bytes, i: int) -> tuple[bytes, int]:
    """Parse a literal string starting at block[i] == '('. Tracks BALANCED
    unescaped parens (legal in PDF without escaping) and skips escape
    pairs. Returns (raw body incl. inner parens, position past ')')."""
    depth = 1
    j = i + 1
    n = len(block)
    while j < n:
        c = block[j]
        if c == 0x5C:  # backslash: skip the escaped char
            j += 2
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return block[i + 1:j], j + 1
        j += 1
    return block[i + 1:n], n  # unterminated: run to end (total)


def _skip_dict(block: bytes, i: int) -> int:
    """Skip an inline dictionary starting at block[i:i+2] == '<<' (BDC/DP
    marked-content operands — ubiquitous in tagged PDFs). Tracks << >>
    nesting and skips literal strings inside (their bytes could contain
    '>>'). Returns the position past the matching '>>'; dict operands are
    NOT text shows — treating them as hex strings injected garbage bytes
    into the extracted text."""
    depth = 0
    j = i
    n = len(block)
    while j < n:
        two = block[j:j + 2]
        if two == b"<<":
            depth += 1
            j += 2
        elif two == b">>":
            depth -= 1
            j += 2
            if depth == 0:
                return j
        elif block[j] == 0x28:  # ( literal string inside the dict
            _, j = _scan_literal(block, j)
        else:
            j += 1
    return n  # unterminated: run to end (total)


def _scan_hex(block: bytes, i: int) -> tuple[bytes | None, int]:
    """Parse a hex string starting at block[i] == '<'. Returns decoded
    bytes (or None if the span is not a well-formed hex string) and the
    position past '>'. Strict: a '<...>' run containing non-hex,
    non-whitespace bytes is NOT a hex string (name objects, malformed
    markup) — stripping the junk and decoding what remains would inject
    garbage into the extracted text."""
    j = block.find(b">", i + 1)
    if j < 0:
        return None, len(block)
    body = block[i + 1:j]
    if re.fullmatch(rb"[0-9A-Fa-f\s]*", body) is None:
        return None, j + 1
    h = re.sub(rb"\s", b"", body)
    if len(h) % 2:
        h += b"0"  # PDF pads an odd final digit with 0
    return bytes.fromhex(h.decode("ascii")), j + 1


def _text_from_content(content: bytes,
                       cmap: dict[int, str] | None = None) -> list[str]:
    """Text-show strings from one decoded content stream, in stream order.
    Tj shows the pending string; TJ shows every string in the preceding
    array (numbers are kerning, skipped); ' and " are move-and-show.
    `cmap` is the document's merged ToUnicode map (see _decode_string)."""
    pieces: list[str] = []
    for block in _text_blocks(content):
        pending: list[bytes] = []
        i, n = 0, len(block)
        while i < n:
            c = block[i]
            if c == 0x28:  # ( literal string
                raw, i = _scan_literal(block, i)
                pending.append(_unescape_literal(raw))
                continue
            if c == 0x3C:
                if block[i + 1:i + 2] == b"<":  # << inline dict: skip whole
                    i = _skip_dict(block, i)
                    continue
                raw, i = _scan_hex(block, i)  # < hex string
                if raw is not None:
                    pending.append(raw)
                continue
            m = _OP_RE.match(block, i)
            if m is None:
                i += 1
                continue
            tok = m.group(0)
            i = m.end()
            if tok in (b"Tj", b"'", b"\""):
                if pending:
                    pieces.append(_decode_string(pending[-1], cmap))
                pending = []
            elif tok == b"TJ":
                if pending:
                    pieces.append(_decode_string(b"".join(pending), cmap))
                pending = []
            elif tok == b"T*":
                pending = []
    return pieces


def _looks_textual(body: bytes, sample: int = 4096, min_frac: float = 0.85) -> bool:
    """True when `body` plausibly IS an (uncompressed) content stream:
    mostly printable-ASCII/whitespace bytes in a bounded sample. Gate for
    the raw-stream and inline fallbacks — compressed/binary bytes that
    happen to contain token-delimited 'BT' plus '(..) Tj' sequences would
    otherwise inject garbage into extracted_text under a clean status.
    Real content streams are operator text (hex strings are hex ASCII);
    image/font/encrypted streams fail this decisively."""
    if not body:
        return False
    head = body[:sample]
    arr = bytearray(head)
    printable = sum(1 for b in arr if 32 <= b <= 126 or b in (9, 10, 13))
    return printable >= min_frac * len(arr)


def _streams(payload: bytes) -> list[bytes]:
    """stream..endstream bodies, decoded. Linear scan (no dict regex — a
    backtracking dict grammar is a DoS surface on adversarial bytes). Each
    body first attempts zlib (FlateDecode is the overwhelmingly common
    filter and zlib's header+checksum make false positives on raw text
    practically impossible); on failure the raw bytes are used as-is.
    /Length is ignored: the nearest-endstream span is the total-function
    choice when the xref can't be trusted."""
    out = []
    pos = 0
    total = 0
    n = len(payload)
    while pos < n:
        s = payload.find(b"stream", pos)
        if s < 0:
            break
        if payload[s - 3:s] == b"end":  # the 'stream' inside 'endstream'
            pos = s + 6
            continue
        b0 = s + 6
        if payload[b0:b0 + 2] == b"\r\n":
            b0 += 2
        elif payload[b0:b0 + 1] in (b"\n", b"\r"):
            b0 += 1
        e = payload.find(b"endstream", b0)
        if e < 0:
            e = n  # unterminated (e.g. the byte cap cut mid-stream):
            # process the prefix, mirroring the documented truncation rule
        body = payload[b0:e].rstrip(b"\r\n")
        try:
            body = zlib.decompressobj().decompress(body, MAX_STREAM_BYTES)
        except Exception:
            # raw/undecodable stream: keep only if it LOOKS like a content
            # stream (see _looks_textual) — undecoded binary (images,
            # embedded fonts, unknown filters) is skipped, not text-scanned
            if not _looks_textual(body):
                pos = e + 9
                continue
        body = body[:MAX_STREAM_BYTES]
        total += len(body)
        out.append(body)
        if total > MAX_TOTAL_STREAM_BYTES:
            break  # decompression-amplification guard across streams
        pos = e + 9
    return out


def extract_pdf_text(payload: bytes | None) -> tuple[str, str]:
    """PDF bytes -> (extracted_text, status). Total.

    extracted_text is the whitespace-normalized join of all text-show
    strings in content-stream order (one normalization rule for the whole
    engine: kernel._normalize). status: 'ok' (text found), 'empty' (no
    text layer / not parseable as text), 'truncated' (payload over cap,
    prefix processed).
    """
    from llmap_spark.kernel import _normalize

    if not payload:
        return "", "empty"
    truncated = len(payload) > MAX_PDF_BYTES
    if truncated:
        payload = payload[:MAX_PDF_BYTES]
    try:
        streams = _streams(payload)
        # pass 1: merge every ToUnicode CMap stream into one code->unicode
        # map; CMap streams carry mapping tables, not text shows, so they
        # are EXCLUDED from content scanning (their hex operands would
        # otherwise leak into extracted text)
        cmap: dict[int, str] = {}
        content: list[bytes] = []
        for stream in streams:
            if b"beginbfchar" in stream or b"beginbfrange" in stream:
                _parse_cmap(stream, cmap)
            # EVERY stream is also content-scanned: _text_from_content
            # only reads inside BT..ET blocks, which genuine CMap streams
            # don't contain (so nothing leaks), while a real content
            # stream whose SHOWN TEXT mentions 'beginbfchar' (a page about
            # PDF internals) previously lost its entire text to the
            # either/or routing
            content.append(stream)
        pieces: list[str] = []
        for stream in content:
            pieces.extend(_text_from_content(stream, cmap or None))
        # a PDF with no stream objects may still inline text operators
        # (generator never does this, but crawl PDFs exist that do); gated
        # on the payload looking textual so compressed/binary blobs never
        # feed the operator scan
        if not pieces and b"BT" in payload and _looks_textual(payload):
            pieces = _text_from_content(payload, cmap or None)
        text = _normalize(" ".join(pieces))
    except Exception:
        return "", "parse_error"
    if len(text) > MAX_PDF_TEXT_CHARS:
        # total-output cap: per-stream caps alone still allow unbounded
        # output across many streams (decompression amplification measured
        # at 377 KB payload -> 119 MB string before this guard)
        text = text[:MAX_PDF_TEXT_CHARS]
        truncated = True
    if not text:
        return "", "empty"
    return text, ("truncated" if truncated else "ok")


# ---------------------------------------------------------------------------
# deterministic generator (tests + driver roundtrip oracle)
# ---------------------------------------------------------------------------

def _escape_literal(s: bytes) -> bytes:
    return s.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _content_stream(text: str, doc_id: int) -> bytes:
    """BT..ET content exercising Tj, TJ-with-kerning, ' and hex/UTF-16
    strings, deterministically varied by doc_id and chunk index."""
    words = text.split()
    chunks = [" ".join(words[i:i + 8]) for i in range(0, len(words), 8)]
    ops = [b"BT /F1 12 Tf 72 720 Td"]
    for ci, chunk in enumerate(chunks):
        lead = b"" if ci == 0 else b" "  # inter-chunk separator inside shows
        mode = (doc_id + ci) % 4
        if not chunk.isascii():
            mode = 3  # non-ASCII must take the UTF-16BE hex path
        if mode == 0:
            ops.append(b"(" + _escape_literal(lead + chunk.encode("latin-1")) + b") Tj")
        elif mode == 1:
            ws = chunk.split(" ")
            mid = max(1, len(ws) // 2)
            a = lead + " ".join(ws[:mid]).encode("latin-1") + b" "
            b = " ".join(ws[mid:]).encode("latin-1")
            ops.append(b"[(" + _escape_literal(a) + b") -120 ("
                       + _escape_literal(b) + b")] TJ")
        elif mode == 2:
            ops.append(b"0 -14 Td (" + _escape_literal(lead + chunk.encode("latin-1"))
                       + b") Tj")
        else:
            enc = b"\xfe\xff" + (lead.decode("latin-1") + chunk).encode("utf-16-be")
            ops.append(b"<" + enc.hex().encode("ascii") + b"> Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


def make_pdf_cid(text: str, doc_id: int = 0,
                 compress: bool | None = None) -> bytes:
    """Minimal Type0/Identity-H-style PDF whose text shows are 2-byte CID
    hex strings resolved through a /ToUnicode CMap:
    extract_pdf_text(make_pdf_cid(t)) == (_normalize(t), 'ok'|'empty').

    The code assignment is NON-trivial (codes 0x21.. in first-appearance
    order of the distinct characters, unrelated to their Unicode values) so
    a decoder that skips the CMap cannot round-trip. The CMap exercises
    both bfchar entries (first half) and an array-form bfrange (rest).
    compress=None alternates FlateDecode on the CONTENT stream by doc_id
    parity (the CMap stream stays raw on odd ids and compressed on even,
    like the content)."""
    from llmap_spark.kernel import _normalize

    if compress is None:
        compress = doc_id % 2 == 0
    norm = _normalize(text)
    codes: dict[str, int] = {}
    for ch in norm:
        if ch not in codes:
            codes[ch] = 0x21 + len(codes)
    if len(codes) > 0xF000:
        raise ValueError("make_pdf_cid: too many distinct characters for "
                         "2-byte CIDs")
    words = norm.split()
    chunks = [" ".join(words[i:i + 8]) for i in range(0, len(words), 8)]
    ops = [b"BT /F1 12 Tf 72 720 Td"]
    for ci, chunk in enumerate(chunks):
        s = ("" if ci == 0 else " ") + chunk
        hexstr = "".join(f"{codes[ch]:04x}" for ch in s)
        ops.append(b"<" + hexstr.encode("ascii") + b"> Tj")
    ops.append(b"ET")
    content = b"\n".join(ops)
    # ToUnicode CMap: bfchar for the first half, array-form bfrange for the
    # rest (dst hex is UTF-16BE per the spec; astral chars emit surrogates)
    items = sorted(codes.items(), key=lambda kv: kv[1])
    half = (len(items) + 1) // 2
    lines = [b"/CIDInit /ProcSet findresource begin",
             b"begincmap"]
    if items[:half]:
        lines.append(str(half).encode() + b" beginbfchar")
        for ch, c in items[:half]:
            dst = ch.encode("utf-16-be").hex().encode("ascii")
            lines.append(b"<%04x> <" % c + dst + b">")
        lines.append(b"endbfchar")
    rest = items[half:]
    if rest:
        lines.append(b"1 beginbfrange")
        arr = b" ".join(b"<" + ch.encode("utf-16-be").hex().encode("ascii")
                        + b">" for ch, _ in rest)
        lines.append(b"<%04x> <%04x> [" % (rest[0][1], rest[-1][1])
                     + arr + b"]")
        lines.append(b"endbfrange")
    lines += [b"endcmap", b"end"]
    cmap_body = b"\n".join(lines)
    if compress:
        content_b = zlib.compress(content)
        cmap_b = zlib.compress(cmap_body)
        filt = b" /Filter /FlateDecode"
    else:
        content_b, cmap_b, filt = content, cmap_body, b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length " + str(len(content_b)).encode() + filt
        + b" >>stream\n" + content_b + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Planted "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >>",
        b"<< /Length " + str(len(cmap_b)).encode() + filt
        + b" >>stream\n" + cmap_b + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + o + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(out)


def make_pdf(text: str, doc_id: int = 0, compress: bool | None = None) -> bytes:
    """Minimal well-formed single-page PDF whose text layer round-trips:
    extract_pdf_text(make_pdf(t)) == (_normalize(t), 'ok'|'empty').
    compress=None alternates FlateDecode by doc_id parity."""
    if compress is None:
        compress = doc_id % 2 == 0
    content = _content_stream(text, doc_id)
    if compress:
        body = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    else:
        body, filt = content, b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length " + str(len(body)).encode() + filt + b" >>stream\n"
        + body + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + o + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(out)
