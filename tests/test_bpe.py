"""Real-BPE operator (operators/bpe.py): encoder vs a spec
implementation, the planted popcount derivation, deterministic training,
and the Spark operator end-to-end."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from llmap_spark.operators.bpe import (bpe_token_count, encode_len,
                                       power_merges, train_bpe)


def spec_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Straight-from-the-paper reference: apply merges strictly in rank
    order, each fully (left-to-right) before the next. Equivalent to the
    production lowest-rank loop whenever a merge's output never creates
    an occurrence of a LOWER-ranked pair — true for any table trained by
    train_bpe (a pair is only learnable after its parts exist) and for
    power_merges; the randomized comparison below exercises exactly that
    class."""
    seq = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(seq):
            if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def test_power_merges_popcount_property():
    ranks = {tuple(p): i for i, p in enumerate(power_merges(5))}
    for k in range(1, 32):
        assert encode_len("ab" * k, ranks) == bin(k).count("1"), k


def test_encode_matches_spec_on_trained_table():
    rng = random.Random(42)
    corpus = [" ".join("".join(rng.choice("abcde")
                               for _ in range(rng.randint(1, 8)))
                       for _ in range(40)) for _ in range(30)]
    merges = train_bpe(corpus, n_merges=40)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for _ in range(300):
        w = "".join(rng.choice("abcdef") for _ in range(rng.randint(0, 12)))
        assert encode_len(w, ranks) == len(spec_encode(w, merges)), w


def test_train_deterministic_and_sensible():
    corpus = ["the cat the cat the dog"] * 3
    m1 = train_bpe(corpus, n_merges=4)
    m2 = train_bpe(list(corpus), n_merges=4)
    assert m1 == m2
    ranks = {tuple(p): i for i, p in enumerate(m1)}
    assert encode_len("the", ranks) == 1  # most frequent word collapses


def test_unknown_chars_stay_single_tokens():
    ranks = {tuple(p): i for i, p in enumerate(power_merges(3))}
    assert encode_len("xyz", ranks) == 3
    assert encode_len("", ranks) == 0


def test_spark_operator_totality_and_counts(spark):
    df = spark.createDataFrame(
        [(0, "ab abab"), (1, None), (2, ""), (3, "ab " * 3)],
        "doc_id long, text string")
    out = {r.doc_id: r.n_bpe2_tokens
           for r in bpe_token_count(df, power_merges(5)).collect()}
    assert out == {0: 2, 1: 0, 2: 0, 3: 3}


def test_train_from_df_bounded_and_deterministic(spark):
    """The Spark training path: bounded portable sample, deterministic
    result, and the trained table actually tokenizes the corpus."""
    from llmap_spark.operators.bpe import train_bpe_from_df

    df = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 3) for i in range(50)],
        "doc_id long, text string")
    m1 = train_bpe_from_df(df, n_merges=8, sample_rows=20)
    m2 = train_bpe_from_df(df, n_merges=8, sample_rows=20)
    # the tiny vocabulary exhausts its pair space at 7 merges — training
    # must stop there, not loop or pad
    assert m1 == m2 and 0 < len(m1) <= 8
    ranks = {tuple(p): i for i, p in enumerate(m1)}
    assert encode_len("the", ranks) == 1


def test_planted_query_matches_arithmetic(spark):
    import __spark_entry__ as e

    got = {r.doc_id: r.n_bpe2_tokens
           for r in e._q_token_count_bpe2(
               spark, "/root/testdata/sf0.001").collect()}
    for d, n in got.items():
        expect = sum(bin(1 + (d + 3 * j) % 31).count("1")
                     for j in range(1, 2 + d % 7))
        assert n == expect, d
