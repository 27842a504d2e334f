"""Exact duplicated-substring dedup vs an independent suffix-array oracle."""

from __future__ import annotations

import hashlib

from llmap_spark.operators.substrings import (_normalize, merge_covered,
                                              substring_dedup, trim_spans)


# ---------------------------------------------------------------------------
# pure-python suffix-array + LCP oracle (independent derivation: no
# rolling hashes — direct lexicographic suffix order over the
# separator-joined corpus, duplicated position = LCP with either
# suffix-order neighbor >= L)
# ---------------------------------------------------------------------------

def _sa_covered(texts: dict[int, str], L: int) -> dict[int, list[tuple[int, int]]]:
    parts = []
    owner = []          # (doc_id, offset_in_doc) per byte, None for seps
    for i, (doc_id, t) in enumerate(sorted(texts.items())):
        b = _normalize(t).encode("utf-8")
        for off in range(len(b)):
            owner.append((doc_id, off))
        parts.append(b)
        # unique separator per doc: bytes outside any document alphabet
        sep = b"\x00" + str(i).encode() + b"\x01"
        for _ in range(len(sep)):
            owner.append(None)
        parts.append(sep)
    s = b"".join(parts)
    n = len(s)
    sa = sorted(range(n), key=lambda i: s[i:])

    def lcp(a: int, b: int) -> int:
        m = 0
        while a + m < n and b + m < n and s[a + m] == s[b + m]:
            m += 1
        return m

    covered_starts: dict[int, list[int]] = {d: [] for d in texts}
    for rank, pos in enumerate(sa):
        best = 0
        if rank > 0:
            best = max(best, lcp(pos, sa[rank - 1]))
        if rank + 1 < n:
            best = max(best, lcp(pos, sa[rank + 1]))
        if best >= L and owner[pos] is not None:
            d, off = owner[pos]
            # the gram must stay inside the document (separators are
            # unique so a cross-separator LCP >= L is impossible anyway)
            covered_starts[d].append(off)
    return {
        d: merge_covered(starts, L,
                         len(_normalize(texts[d]).encode("utf-8")))
        for d, starts in covered_starts.items()
    }


def _h(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _mk_corpus() -> dict[int, str]:
    """Mixed corpus: cross-doc shared blocks, within-doc repeats, unique
    docs, shared paragraph lifted into different contexts, short docs."""
    shared = "the quick brown fox jumps over the lazy dog again and again"
    texts = {
        0: f"{_h('a0')} {shared} {_h('b0')}",
        1: f"{_h('a1')} {shared} {_h('b1')}",
        2: f"{_h('a2')} {_h('b2')}",                      # unique
        3: f"{_h('u3')} {_h('u3')}",                      # within-doc repeat
        4: "tiny",                                        # < L
        5: f"{shared}",                                   # exactly the block
        6: f"prefix {_h('a6')} suffix {shared[:30]}x{_h('b6')}",
    }
    return texts


def test_kernel_matches_suffix_array_oracle(spark):
    L = 20
    texts = _mk_corpus()
    want = _sa_covered(texts, L)
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string")
    got_rows = substring_dedup(df, min_len=L).collect()
    got = {r.doc_id: [(x["start"], x["end"]) for x in r.spans]
           for r in got_rows}
    assert got == want
    # and the trim agrees byte-for-byte with the oracle-derived trim
    for r in got_rows:
        b = _normalize(texts[r.doc_id]).encode("utf-8")
        assert r.text_deduped == trim_spans(
            b, want[r.doc_id]).decode("utf-8")
        assert r.n_dup_chars == sum(e - s for s, e in want[r.doc_id])


def test_recall_on_planted_shared_block(spark):
    """Every byte of a >=L shared block (and nothing else) is covered,
    including the identical-context bytes adjacent to it."""
    L = 20
    texts = _mk_corpus()
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string")
    out = {r.doc_id: r for r in substring_dedup(df, min_len=L).collect()}
    # docs 0/1/5 share the block; doc 5 IS the block -> fully covered
    assert out[5].n_dup_chars == len(_normalize(texts[5]))
    assert out[5].text_deduped == ""
    for d in (0, 1):
        assert out[d].n_spans >= 1
        # the shared block bytes are all inside the covered region
        spans = [(x["start"], x["end"]) for x in out[d].spans]
        norm = _normalize(texts[d])
        i = norm.index("the quick")
        assert any(s <= i and i + 30 <= e for s, e in spans)
    # unique and sub-L docs stay untouched
    assert out[2].n_spans == 0 and out[2].text_deduped == _normalize(texts[2])
    assert out[4].n_spans == 0 and out[4].text_deduped == "tiny"
    # within-doc repetition is duplication too
    assert out[3].n_spans >= 1 and out[3].n_dup_chars >= 32


def test_merge_and_trim_kernels():
    assert merge_covered([], 5, 100) == []
    assert merge_covered([0, 3, 10], 5, 100) == [(0, 8), (10, 15)]
    assert merge_covered([7, 0], 10, 12) == [(0, 12)]  # clip + merge
    raw = b"0123456789abcdef"
    assert trim_spans(raw, [(0, 4), (8, 12)]) == b"4567cdef"
    assert trim_spans(raw, []) == raw
    # multibyte snap: never split a UTF-8 character
    s = "héllo wörld amazing".encode("utf-8")
    got = trim_spans(s, [(1, 3)])
    got.decode("utf-8")  # must not raise


def test_total_on_edge_inputs(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "short"),
         (4, "x" * 100), (5, "x" * 100)],  # identical long runs
        "doc_id long, text string")
    out = {r.doc_id: r for r in substring_dedup(df, min_len=20).collect()}
    assert len(out) == 6
    for d in (0, 1, 2, 3):
        assert out[d].n_spans == 0
    # identical docs fully covered
    assert out[4].text_deduped == "" and out[5].text_deduped == ""
