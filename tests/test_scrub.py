"""Scrubbing operators: paragraph dedup, PII redaction, decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from llmap_spark.operators.scrub import (decontaminate, dedup_paragraphs,
                                         redact_pii)


def test_paragraph_dedup_keeps_first_occurrence(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta\n\ncommon boiler\n\ngamma"),
         (1, "common boiler\n\ndelta"),
         (2, "common boiler"),            # fully-duplicate doc survives empty
         (3, "alpha beta\n\nalpha beta"),  # within-doc repeat: keep first
         (4, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_paragraphs(docs).collect()}
    assert got[0].text_clean == "alpha beta\n\ncommon boiler\n\ngamma"
    assert got[1].text_clean == "delta"
    assert got[2].text_clean == "" and got[2].n_paras_kept == 0
    assert got[3].text_clean == ""  # both paras lost to doc 0's copy
    assert got[3].n_paras == 2
    assert got[4].text_clean == "" or got[4].text_clean is None
    assert len(got) == 5  # never loses rows


def test_paragraph_dedup_normalizes_whitespace_for_identity(spark):
    docs = spark.createDataFrame(
        [(0, "spaced   out"), (1, "spaced out")], "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_paragraphs(docs).collect()}
    # doc 1's paragraph is a normalized duplicate of doc 0's
    assert got[0].n_paras_kept == 1 and got[1].n_paras_kept == 0


def test_redact_pii_counts_and_replaces(spark):
    docs = spark.createDataFrame(
        [(0, "mail a@b.io and c.d+x@e-f.org, ip 10.0.0.1, call 555-123-4567"),
         (1, "no pii here"),
         (2, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert (got[0].n_emails, got[0].n_ipv4, got[0].n_phones) == (2, 1, 1)
    assert got[0].text_redacted == \
        "mail <EMAIL> and <EMAIL>, ip <IP>, call <PHONE>"
    assert (got[1].n_emails, got[1].n_ipv4, got[1].n_phones) == (0, 0, 0)
    assert got[1].text_redacted == "no pii here"
    assert got[2].text_redacted == ""


def test_redact_pii_email_wins_over_ip_like_domain(spark):
    docs = spark.createDataFrame(
        [(0, "x@10.0.0.1.com evil"),
         (1, "call 555-123-4567@site.example today")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(docs).collect()}
    # the ip-like mail domain redacts as ONE email, not an ip inside it —
    # and the counts agree with the placeholders actually inserted
    assert got[0].n_emails == 1 and got[0].text_redacted == "<EMAIL> evil"
    assert got[0].n_ipv4 == 0 and got[0].n_phones == 0
    # a phone swallowed by the email match is not also counted as a phone
    assert got[1].n_emails == 1 and got[1].n_phones == 0
    assert got[1].text_redacted == "call <EMAIL> today"


def test_decontaminate_flags_shared_ngrams(spark):
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps"),
         (1, "totally clean words only here"),
         (2, "a b")],  # < n words: no n-grams, excluded
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [("quick brown fox benchmark sentence",)], "text string")
    got = {r.doc_id: r for r in decontaminate(docs, bench, n=3).collect()}
    assert got[0].contaminated == 1 and got[0].n_hits == 1
    assert got[1].contaminated == 0 and got[1].n_hits == 0
    assert 2 not in got


def test_decontaminate_counts_distinct_grams(spark):
    docs = spark.createDataFrame(
        [(0, "x y z x y z x y z")], "doc_id long, text string")
    bench = spark.createDataFrame([("x y z",), ("y z x",)], "text string")
    r = decontaminate(docs, bench, n=3).collect()[0]
    # doc grams: {x y z, y z x, z x y} -> 2 distinct hits despite repeats
    assert r.n_hits == 2


def test_decontaminate_empty_benchmark_is_all_clean(spark):
    docs = spark.createDataFrame(
        [(0, "some perfectly ordinary words here")],
        "doc_id long, text string")
    bench = spark.createDataFrame([], "text string")
    r = decontaminate(docs, bench, n=3).collect()[0]
    assert (r.n_hits, r.contaminated) == (0, 0)


def test_paragraph_dedup_preserves_blank_paragraphs(spark):
    """Blank paragraphs are spacing, not content: they must NOT dedup
    corpus-wide to one arbitrary winner (every other doc's spacing would
    silently mutate)."""
    docs = spark.createDataFrame(
        [(0, "p\n\n\n\nq"),      # the '' between the four newlines
         (1, "x\n\n\n\ny"),      # ... must survive here too
         (2, "a\n\n \n\nb")],    # whitespace-only paragraph: same rule
        "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_paragraphs(docs).collect()}
    assert got[0].text_clean == "p\n\n\n\nq" and got[0].n_paras_kept == 3
    assert got[1].text_clean == "x\n\n\n\ny" and got[1].n_paras_kept == 3
    assert got[2].text_clean == "a\n\n \n\nb" and got[2].n_paras_kept == 3


def test_paragraph_dedup_sep_is_literal_not_regex(spark):
    """A separator containing regex metacharacters must split literally
    (the \\Q..\\E quoting contract), not explode into per-char splits."""
    docs = spark.createDataFrame(
        [(0, "alpha|+|beta|+|alpha")], "doc_id long, text string")
    r = dedup_paragraphs(docs, sep="|+|").collect()[0]
    assert r.n_paras == 3
    assert r.text_clean == "alpha|+|beta"  # third para deduped vs first
    assert r.n_paras_kept == 2


def test_normalize_text_nfc_and_control_strip(spark):
    from llmap_spark.operators.scrub import normalize_text

    docs = spark.createDataFrame(
        [(0, "cafe\u0301 menu"),  # combining acute -> composed e-acute
         (1, "plain ascii"),
         (2, "bell\x07 and\x00null"),     # C0 controls stripped
         (3, "tab\tand\nnewline kept"),
         (4, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in normalize_text(docs).collect()}
    assert got[0].text_clean == "caf\u00e9 menu" and got[0].changed == 1
    assert got[1].text_clean == "plain ascii" and got[1].changed == 0
    assert got[2].text_clean == "bell and" + "null"
    assert got[2].changed == 1
    assert got[3].text_clean == "tab\tand\nnewline kept"
    assert got[3].changed == 0
    assert got[4].text_clean == "" and got[4].changed == 0
    # idempotent: a second pass changes nothing
    again = normalize_text(
        spark.createDataFrame([(0, got[0].text_clean)],
                              "doc_id long, text string")).collect()[0]
    assert again.changed == 0


def test_normalize_text_strips_before_composing(spark):
    """A control char BETWEEN a base char and its combining mark blocks
    composition — strip must run first or the output is neither NFC nor
    stable under a second pass."""
    import unicodedata

    from llmap_spark.operators.scrub import normalize_text

    docs = spark.createDataFrame(
        [(0, "e\x00\u0301 rest")], "doc_id long, text string")
    r = normalize_text(docs).collect()[0]
    assert r.text_clean == "\u00e9 rest"  # composed, control gone
    assert unicodedata.is_normalized("NFC", r.text_clean)
    again = normalize_text(
        spark.createDataFrame([(0, r.text_clean)],
                              "doc_id long, text string")).collect()[0]
    assert again.changed == 0


def test_decontaminate_plan_broadcasts_benchmark(spark):
    docs = spark.createDataFrame(
        [(0, "the quick brown fox")], "doc_id long, text string")
    bench = spark.createDataFrame([("quick brown fox",)], "text string")
    plan = decontaminate(docs, bench, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
