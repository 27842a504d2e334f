"""Winnowing document fingerprints: pure-python oracle, the winnowing
guarantee (shared substrings are always detected), and overlap pairing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from llmap_spark.operators import fingerprints as fpm

DOCS = "/root/testdata/sf0.001/documents.parquet"
K, W = 16, 8


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def _py_winnow(text: str, k: int, window: int) -> list[int]:
    """Loop reimplementation of the whole operator (hash + robust
    winnowing with rightmost-min tie-break) as the independent oracle."""
    t = " ".join(text.split()).lower().encode("utf-8")
    if len(t) < k:
        return []
    FNV = 1099511628211
    M1, M2 = 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53
    MASK = (1 << 64) - 1

    def mix(h):
        h ^= h >> 33
        h = (h * M1) & MASK
        h ^= h >> 33
        h = (h * M2) & MASK
        h ^= h >> 33
        return h

    hs = []
    for i in range(len(t) - k + 1):
        acc = 0
        for j in range(k):
            acc = (acc + t[i + j] * pow(FNV, j, 1 << 64)) & MASK
        hs.append(mix(acc))
    if len(hs) <= window:
        return sorted({min(hs)})
    picked = set()
    for s in range(len(hs) - window + 1):
        win = hs[s:s + window]
        m = min(win)
        # rightmost minimal position
        picked.add(s + max(i for i, v in enumerate(win) if v == m))
    return sorted({hs[p] for p in picked})


def test_udf_matches_python_oracle(spark, docs):
    sample = docs.limit(15).collect()
    got = {r.doc_id: sorted(r.fps) for r in
           docs.limit(15).select(
               "doc_id",
               fpm.winnow_fingerprints_udf(K, W)(F.col("text")).alias("fps"))
           .collect()}
    for r in sample:
        want = [v - (1 << 64) if v >= (1 << 63) else v  # int64 view
                for v in _py_winnow(r.text, K, W)]
        assert got[r.doc_id] == sorted(want), r.doc_id


def test_winnowing_guarantee_on_planted_overlap(spark):
    """Any shared normalized substring >= k + window - 1 chars must share
    at least one fingerprint (the winnowing theorem) — planted paragraph
    lift from doc 1 into doc 2 must be paired."""
    lifted = ("this exact paragraph was lifted wholesale from the first "
              "document into the second one today")
    rows = [
        (1, "opening words of the original document " + lifted + " and its own ending"),
        (2, "a completely different beginning here " + lifted + " with another tail"),
        (3, "unrelated third document that shares no phrasing with the others at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.n_shared
             for r in fpm.winnow_overlap_pairs(df, k=K, window=W,
                                               min_shared=1).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] >= 1
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_hot_fingerprint_cap_prunes_boilerplate(spark):
    # one viral phrase in every doc; with max_df below the corpus size the
    # phrase's fingerprints are dropped and no pair forms from it alone
    viral = "subscribe to our newsletter for the very latest updates today"
    # bodies built from per-doc tokens so no k-gram (including the
    # body/viral junction, which contains the last per-doc token) is
    # shared between docs — only the viral phrase itself is common
    rows = [(i, " ".join(f"tok{i}x{j}" for j in range(12)) + " " + viral)
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = fpm.winnow_overlap_pairs(df, k=K, window=W, min_shared=1,
                                     max_df=5).collect()
    assert pairs == []


def test_tiny_docs_fingerprint_null_not_sentinel(spark):
    rows = [(1, "short"), (2, "also"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert fpm.doc_fingerprints(df, k=K, window=W).count() == 0
    assert fpm.winnow_overlap_pairs(df, k=K, window=W).count() == 0


def test_density_bound(spark, docs):
    """Winnowing selects ~2/(w+1) of k-grams; assert a loose upper bound so
    a regression to 'every k-gram' (no winnowing) fails."""
    r = docs.limit(10).select(
        "doc_id", F.length(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("n"),
        F.size(fpm.winnow_fingerprints_udf(K, W)(F.col("text"))).alias("nfp")
    ).collect()
    for row in r:
        n_grams = max(1, row.n - K + 1)
        assert row.nfp <= 0.5 * n_grams


# -- content-defined chunking -------------------------------------------------

def _norm_lower(t):
    # the kernel's ASCII-only fold (engine-portable; see cdc_chunks_udf)
    from llmap_spark.kernel import _ASCII_LOWER
    return " ".join(t.split()).translate(_ASCII_LOWER)


def test_cdc_concat_invariant_and_bounds(spark, docs):
    from llmap_spark.operators import fingerprints as fpm2

    rows = docs.limit(12).collect()
    extra = [(9001, "unicode çök İİ " * 40), (9002, "short"), (9003, "")]
    df = spark.createDataFrame(
        [(r.doc_id, r.text) for r in rows] + extra, "doc_id long, text string")
    got = {r.doc_id: r.chunks for r in df.select(
        "doc_id", fpm2.cdc_chunks_udf(min_len=64, max_len=512)(
            F.col("text")).alias("chunks")).collect()}
    texts = {r.doc_id: r.text for r in rows} | {i: t for i, t in extra}
    for d, t in texts.items():
        want = _norm_lower(t)
        chunks = got[d]
        assert "".join(chunks) == want, d
        if want:
            assert all(len(c.encode("utf-8")) <= 512 + 3 for c in chunks), d
            body = chunks[:-1]
            if len(want.encode()) >= 64:
                # UTF-8 boundary snapping may shave up to 3 bytes off a
                # body chunk on multibyte text (documented in the UDF)
                assert all(len(c.encode("utf-8")) >= 64 - 3 for c in body), d
        else:
            assert chunks == []


def test_cdc_shift_resistance(spark, docs):
    """THE content-defined property: a prefix insertion must not shift
    every downstream boundary — most chunk hashes survive the edit
    (fixed-size windows would lose all of them)."""
    import hashlib

    from llmap_spark.operators import fingerprints as fpm2

    import random

    # corpus docs are ~300 chars (1-2 chunks) — synthesize long seeded
    # texts so there are many boundaries to re-align
    base = []
    for s in range(3):
        rng = random.Random(100 + s)
        base.append(" ".join(
            f"w{rng.randrange(10_000)}" for _ in range(1200)))
    rows = []
    for i, t in enumerate(base):
        rows.append((2 * i, t))
        rows.append((2 * i + 1, "freshly inserted leading words " + t))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.chunks for r in df.select(
        "doc_id", fpm2.cdc_chunks_udf(min_len=64, max_len=512)(
            F.col("text")).alias("chunks")).collect()}
    for i in range(len(base)):
        a = {hashlib.md5(c.encode()).hexdigest() for c in got[2 * i]}
        b = {hashlib.md5(c.encode()).hexdigest() for c in got[2 * i + 1]}
        assert len(a & b) / len(a) >= 0.5, i  # boundaries re-align


def test_cdc_chunk_table_subdoc_dedup(spark):
    from llmap_spark.operators.fingerprints import cdc_chunk_table

    shared = " ".join(f"common word{j} payload" for j in range(120))
    rows = [(1, "alpha opening text " * 10 + shared),
            (2, "totally different start here " * 10 + shared)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = cdc_chunk_table(df, min_len=64, max_len=512)
    by_doc = {}
    for r in t.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.chunk_md5)
    assert by_doc[1] & by_doc[2]  # the lifted span dedups at chunk level
