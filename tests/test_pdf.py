"""PDF text-layer kernel tests: generator/extractor roundtrip, escape and
string-coding coverage, totality on arbitrary bytes, bounded work."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings, strategies as st

from llmap_spark import pdf
from llmap_spark.kernel import _normalize


CASES = [
    "simple ascii words only here",
    "parens (nested (deep)) and \\ backslash \\\\ literals ) stray",
    "unicode café naïve İstanbul — em-dash ünïcödé",
    "a longer document " + " ".join(f"word{i}" for i in range(300)),
    "tabs\tand\nnewlines   collapse",
]


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 7])
@pytest.mark.parametrize("text", CASES)
def test_roundtrip_all_modes(text, doc_id):
    # doc_id steers Tj / TJ-with-kerning / Td-prefixed / UTF-16BE-hex modes
    # and FlateDecode vs raw stream coding
    got, status = pdf.extract_pdf_text(pdf.make_pdf(text, doc_id))
    assert got == _normalize(text)
    assert status == "ok"


def test_empty_and_whitespace_pdfs():
    for t in ("", "   \t\n"):
        got, status = pdf.extract_pdf_text(pdf.make_pdf(t, 0))
        assert got == "" and status == "empty"
    assert pdf.extract_pdf_text(None) == ("", "empty")
    assert pdf.extract_pdf_text(b"") == ("", "empty")


def test_octal_and_named_escapes():
    content = b"BT (A\\101\\x \\( \\) \\\\ B\\n) Tj ET"
    raw = b"%PDF-1.4\nstream\n" + content + b"\nendstream\n%%EOF"
    got, status = pdf.extract_pdf_text(raw)
    # \101 = 'A'; \x (unknown escape) drops the backslash; \n is whitespace
    assert got == "AAx ( ) \\ B"
    assert status == "ok"


def test_balanced_unescaped_parens_in_literal():
    # PDF spec: balanced parens inside a literal string need NO escaping —
    # a regex tokenizer cuts at the first ')', losing text
    content = b"BT (outer (inner (deep)) tail) Tj ((lead) rest) Tj ET"
    raw = b"%PDF-1.4\nstream\n" + content + b"\nendstream"
    got, status = pdf.extract_pdf_text(raw)
    assert got == "outer (inner (deep)) tail (lead) rest"
    assert status == "ok"


def test_malformed_hex_runs_are_not_text():
    # '<zz41>' is not a hex string (name/markup junk) — stripping non-hex
    # and decoding the rest would inject 'A' into the output
    raw = b"%PDF-1.4\nstream\nBT <zz41> Tj (real) Tj ET\nendstream"
    got, _ = pdf.extract_pdf_text(raw)
    assert got == "real"


def test_marked_content_dicts_are_skipped():
    # tagged-PDF output (Word/Acrobat) wraps text in BDC/EMC with inline
    # dict operands; the dict is NOT a hex string and its contents
    # (including /ActualText literals) must not leak into the text
    content = (b"BT /P << /MCID 0 /ActualText (hidden) >> BDC "
               b"[(Hello ) -20 (world)] TJ EMC ET")
    raw = b"%PDF-1.4\nstream\n" + content + b"\nendstream"
    got, status = pdf.extract_pdf_text(raw)
    assert got == "Hello world"
    assert status == "ok"
    # nested dicts too
    content2 = b"BT << /A << /B 1 >> /S (x >> y) >> BDC (real text) Tj ET"
    raw2 = b"%PDF-1.4\nstream\n" + content2 + b"\nendstream"
    assert pdf.extract_pdf_text(raw2)[0] == "real text"


def test_unterminated_literal_is_total():
    raw = b"%PDF-1.4\nstream\nBT (never closed \\( here Tj ET\nendstream"
    text, status = pdf.extract_pdf_text(raw)
    assert isinstance(text, str)  # no exception, no hang


def test_tj_array_kerning_numbers_skipped():
    content = b"BT [(alpha ) -250 (beta) 120 ( gamma)] TJ ET"
    raw = b"%PDF-1.4\nstream\n" + content + b"\nendstream\n%%EOF"
    got, _ = pdf.extract_pdf_text(raw)
    assert got == "alpha beta gamma"


def test_utf16_hex_string():
    payload = "héllo wörld".encode("utf-16-be")
    tok = b"<" + (b"\xfe\xff" + payload).hex().encode() + b"> Tj"
    raw = b"%PDF-1.4\nstream\nBT " + tok + b" ET\nendstream"
    got, _ = pdf.extract_pdf_text(raw)
    assert got == "héllo wörld"


def test_undecodable_flate_stream_is_skipped():
    # garbage that is neither valid zlib nor useful raw text
    raw = (b"%PDF-1.4\n<< /Filter /FlateDecode >>stream\n\x78\x9c\x00broken"
           b"\nendstream")
    got, status = pdf.extract_pdf_text(raw)
    assert status in ("empty", "ok")  # never raises


def test_truncation_cap():
    body = b"BT (tail text) Tj ET"
    filler = b"%" + b"x" * (pdf.MAX_PDF_BYTES + 100)
    got, status = pdf.extract_pdf_text(
        b"%PDF-1.4\nstream\n" + body + b"\nendstream\n" + filler)
    assert got == "tail text"
    assert status == "truncated"


def test_compressed_and_raw_agree():
    t = "agreement between codings of the same text layer"
    a, _ = pdf.extract_pdf_text(pdf.make_pdf(t, compress=True))
    b, _ = pdf.extract_pdf_text(pdf.make_pdf(t, compress=False))
    assert a == b == _normalize(t)


def test_zip_bomb_bounded():
    # 200 MB of zeros compressed to ~200 KB: decode must stop at the cap
    bomb = zlib.compress(b"\x00" * 200_000_000)
    raw = b"%PDF-1.4\n<< /Filter /FlateDecode >>stream\n" + bomb + b"\nendstream"
    got, status = pdf.extract_pdf_text(raw)
    assert status in ("empty", "ok")


def test_adversarial_bt_flood_is_linear():
    """A stream of 300k 'BT ' markers with no ET must parse in linear time
    (the regex formulation backtracked from every unmatched BT: O(n^2),
    minutes at the stream cap)."""
    import time

    flood = b"BT " * 300_000
    raw = b"%PDF-1.4\nstream\n" + flood + b"\nendstream"
    t0 = time.time()
    text, status = pdf.extract_pdf_text(raw)
    assert time.time() - t0 < 5.0
    assert isinstance(text, str)


def test_unterminated_bt_block_runs_to_end():
    raw = b"%PDF-1.4\nstream\nBT (tail words) Tj\nendstream"  # no ET
    got, status = pdf.extract_pdf_text(raw)
    assert got == "tail words"  # total: unterminated block still extracts


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4096))
def test_total_on_arbitrary_bytes(data):
    text, status = pdf.extract_pdf_text(data)
    assert isinstance(text, str)
    assert status in ("ok", "empty", "truncated", "parse_error")


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=1024))
def test_total_on_pdfish_bytes(data):
    framed = b"%PDF-1.4\nstream\n" + data + b"\nendstream\nBT " + data + b" ET"
    text, status = pdf.extract_pdf_text(framed)
    assert isinstance(text, str)


def test_et_bytes_inside_strings_do_not_truncate_blocks():
    # 'ET'/'BT' bytes inside string operands are data, not operators —
    # 'MARKET REPORT' must survive its own generator roundtrip
    for did in (0, 1, 2, 3):
        got, status = pdf.extract_pdf_text(
            pdf.make_pdf("MARKET REPORT ON NET BUDGET TARGETS", did))
        assert got == "MARKET REPORT ON NET BUDGET TARGETS", did
        assert status == "ok"
    raw = b"%PDF-1.4\nstream\nBT (GET SET) Tj (BT ET inside) Tj ET\nendstream"
    assert pdf.extract_pdf_text(raw)[0] == "GET SET BT ET inside"


def test_total_output_cap_on_amplified_streams():
    # many small zlib streams expanding hugely: output must stay bounded
    import zlib as z

    show = b"BT (" + b"A" * 1000 + b") Tj ET\n"
    one = z.compress(show * 3000)  # ~3 MB decoded per stream
    payload = b"%PDF-1.4\n" + b"".join(
        b"stream\n" + one + b"\nendstream\n" for _ in range(50))
    text, status = pdf.extract_pdf_text(payload)
    assert len(text) <= pdf.MAX_PDF_TEXT_CHARS
    assert status == "truncated"


def test_truncated_midstream_processes_prefix():
    # the byte cap cutting 'endstream' off must still extract the prefix
    body = b"BT (prefix text survives) Tj ET"
    raw = (b"%PDF-1.4\nstream\n" + body + b" "
           + b"x" * (pdf.MAX_PDF_BYTES + 10))  # no endstream within cap
    text, status = pdf.extract_pdf_text(raw)
    assert "prefix text survives" in text
    assert status == "truncated"


def test_octal_overflow_per_spec():
    # ISO 32000: three octal digits consumed, high-order overflow ignored
    assert pdf._unescape_literal(b"\\777") == b"\xff"
    assert pdf._unescape_literal(b"\\101B") == b"AB"
    assert pdf._unescape_literal(b"\\40x") == b" x"


def test_binary_stream_with_planted_bt_not_scanned():
    """An undecodable BINARY stream containing token-delimited 'BT (x) Tj
    ET' bytes must NOT inject text under a clean status: the raw-stream
    fallback is gated on the bytes looking like a content stream."""
    noise = bytes(range(256)) * 8  # decisively non-textual
    planted = noise + b"\nBT (garbage) Tj ET\n" + noise
    payload = (b"%PDF-1.4\n1 0 obj\n<< /Length " +
               str(len(planted)).encode() + b" >>stream\n" + planted +
               b"\nendstream\nendobj\n%%EOF\n")
    text, status = pdf.extract_pdf_text(payload)
    assert text == ""
    assert status == "empty"


def test_inline_fallback_still_works_for_textual_payloads():
    """A streamless PDF with inline text operators (textual bytes) still
    extracts — the gate only blocks binary payloads."""
    payload = b"%PDF-1.0\nBT (hello inline world) Tj ET\n%%EOF\n"
    text, status = pdf.extract_pdf_text(payload)
    assert text == "hello inline world"
    assert status == "ok"


def test_cid_cmap_roundtrip():
    """Type0/Identity-H tier: 2-byte CID hex shows resolved through a
    /ToUnicode CMap (bfchar + array bfrange), both stream codings. The
    code assignment is unrelated to Unicode values, so skipping the CMap
    cannot round-trip."""
    from llmap_spark.kernel import _normalize

    cases = ["hello cid world this is a longer sentence with repeats",
             "héllo wörld ünïcode 你好 \U0001F600 emoji",
             "", "   ", "one"]
    for t in cases:
        for d in (0, 1):  # raw and FlateDecode
            got = pdf.extract_pdf_text(pdf.make_pdf_cid(t, d))
            want = (_normalize(t), "ok" if _normalize(t) else "empty")
            assert got == want, (t[:20], d, got)


def test_parse_cmap_forms():
    m = {}
    pdf._parse_cmap(b"beginbfrange\n<0010> <0013> <0041>\nendbfrange", m)
    assert m == {0x10: "A", 0x11: "B", 0x12: "C", 0x13: "D"}
    m = {}
    pdf._parse_cmap(
        b"beginbfchar\n<0001> <00660066>\nendbfchar\n"
        b"beginbfrange\n<0005> <0006> [<0058> <0059>]\nendbfrange", m)
    assert m == {1: "ff", 5: "X", 6: "Y"}
    # hostile range is bounded, malformed entries skipped, never raises
    m = {}
    pdf._parse_cmap(b"beginbfrange\n<0000> <ffffffff> <0041>\nendbfrange", m)
    assert len(m) <= pdf.MAX_CMAP_ENTRIES
    pdf._parse_cmap(b"beginbfchar garbage endbfchar", {})


def test_cmap_partial_map_does_not_corrupt_ascii_hex():
    """The all-codes rule: a hex string whose 2-byte codes are not ALL in
    the map falls back to latin-1 — a partial CMap must never corrupt
    plain hex-ASCII shows."""
    assert pdf._decode_string(b"AB", {0x4142: "Z"}) == "Z"
    assert pdf._decode_string(b"AB", {0x9999: "q"}) == "AB"
    assert pdf._decode_string(b"ABC", {0x4142: "Z"}) == "ABC"  # odd length


def test_bfrange_into_surrogate_gap_stays_utf8_safe():
    """A scalar bfrange whose increments land in the UTF-16 surrogate gap
    (D800-DFFF) must map to U+FFFD, never a lone surrogate — chr() of a
    surrogate survives in a Python str but CRASHES at the Arrow/UTF-8
    boundary, violating the never-raise kernel invariant."""
    m = {}
    pdf._parse_cmap(b"beginbfrange\n<0000> <00ff> <D7A0>\nendbfrange", m)
    assert len(m) == 256
    for v in m.values():
        assert all(not 0xD800 <= ord(ch) <= 0xDFFF for ch in v)
    "".join(m.values()).encode("utf-8")  # must not raise


def test_cmap_dst_size_is_bounded():
    """A hostile bfrange with a multi-MB dst hex must not expand to
    dst_len x range_size chars (review-found: entry COUNT was capped but
    per-entry SIZE was not — ~0.5 TB allocation from a few-MB payload)."""
    big = b"0041" * 100_000  # 400 KB of hex -> 200k chars uncapped
    m = {}
    pdf._parse_cmap(b"beginbfrange\n<0000> <ffff> <" + big + b">\nendbfrange", m)
    assert m and all(len(v) <= pdf.MAX_CMAP_DST_CHARS for v in m.values())
    m = {}
    pdf._parse_cmap(b"beginbfchar\n<0001> <" + big + b">\nendbfchar", m)
    assert all(len(v) <= pdf.MAX_CMAP_DST_CHARS for v in m.values())
