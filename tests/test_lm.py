"""Char n-gram LM scorer (operators/lm.py): training determinism,
quality-ordering sanity, totality, and Spark-vs-python equality."""

from __future__ import annotations

from llmap_spark.operators.lm import (_grams, lm_score, train_char_lm,
                                      train_char_lm_from_df)


def test_train_deterministic_and_scores_ordered():
    corpus = ["the cat sat on the mat and the dog ran off"] * 20
    m1, oov1 = train_char_lm(corpus)
    m2, oov2 = train_char_lm(list(corpus))
    assert (m1, oov1) == (m2, oov2)
    # every in-vocab gram is cheaper than OOV; the most frequent gram
    # must carry the MINIMUM cost (an inverted sign would flip this)
    assert all(0 <= v < oov1 for v in m1.values())
    assert m1["the"] == min(m1.values())


def test_typical_text_scores_lower_than_junk():
    corpus = ["the quick brown fox jumps over the lazy dog " * 3] * 10
    model, oov = train_char_lm(corpus)

    def avg(t):
        total = sum(model.get(g, oov) for g in _grams(t, 3))
        k = max(1, len(t) - 2)
        return total // k

    assert avg("the quick brown fox") < avg("zzqxj vvkpw qqq")


def test_totality_short_and_empty():
    model, oov = train_char_lm(["abcabc"])
    assert train_char_lm([]) == ({}, 0)
    # grams of short/None handled by the operator path (below)


def test_vocab_truncation_deterministic():
    corpus = ["ab" * 50, "cd" * 40, "ef" * 2]
    m_full, _ = train_char_lm(corpus)
    m_cut, _ = train_char_lm(corpus, max_vocab=3)
    assert len(m_cut) == 3
    top = sorted(m_full, key=lambda g: (m_full[g], g))[:3]
    assert set(m_cut) == set(top)


def test_spark_scoring_matches_python(spark):
    corpus_rows = [(i, "the cat sat on the mat " * 4) for i in range(30)]
    df = spark.createDataFrame(corpus_rows + [(98, None), (99, "xy")],
                               "doc_id long, text string")
    model, oov = train_char_lm_from_df(df, sample_rows=10)
    out = {r.doc_id: (r.n_grams, r.millibits_total, r.avg_millibits)
           for r in lm_score(df, model, oov).collect()}
    for d, t in corpus_rows + [(98, None), (99, "xy")]:
        total = sum(model.get(g, oov) for g in _grams(t or "", 3))
        k = max(0, len(t or "") - 2)
        assert out[d] == (k, total, total // k if k else 0), d
    assert out[98] == (0, 0, 0) and out[99] == (0, 0, 0)
