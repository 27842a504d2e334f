"""Real byte-pair-encoding tokenizer: train + count, from scratch.

The reference prices LLM requests with a HuggingFace tokenizer
(reference parse.py:17-18). `textstats.token_count_bpe` is the portable
regex stand-in; this module is the REAL thing — a merges-table BPE with
the classic greedy lowest-rank merge loop — kept deterministic and
dependency-free so the cost model is engine-exact and reproducible:

  train_bpe(texts, n_merges)    learn a ranked merges list from an
                                iterable of texts (frequency + lexicographic
                                tie-break -> fully deterministic)
  bpe_token_count(df, merges)   per-row token count under a merges table,
                                Arrow-batched pandas UDF with per-executor
                                word memoization (web text repeats a small
                                vocabulary, so the per-word encode runs
                                ~100x less often than per-token)

Pre-tokenization is whitespace splitting (the same rule every other text
operator here uses); BPE runs WITHIN words, so counts are a sum of
per-word encode lengths and the operator distributes embarrassingly.

Scale notes: the ranks dict is shipped once per executor via a Spark
broadcast (a 50k-merge vocab is ~1 MB — closure capture would pickle it
into every task). Training is driver-side over a BOUNDED sample the
caller collects (train_bpe_from_df caps rows); a tokenizer trained on a
seeded sample is the standard practice — training never scans the full
corpus.

Hash-oracle strategy (planted, see __spark_entry__.token_count_bpe2):
under the "power merges" table [(a,b), (ab,ab), (abab,abab), ...] the
classic merge loop reduces a word 'ab'*k by left-to-right non-overlapping
pairing per level — binary carries — so its token count is EXACTLY
bit_count(k). Planted texts of such words make the real encoder's output
pure integer arithmetic for the SQL oracle, while pytest pins the encoder
against a slow spec implementation on arbitrary words.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

def power_merges(levels: int = 5, a: str = "a", b: str = "b") -> list[tuple[str, str]]:
    """The planted-oracle merges table: (a,b), then (ab,ab), (abab,abab),
    ... doubling for `levels-1` more ranks. Under these merges
    encode_len('ab'*k) == bit_count(k) for k < 2**levels."""
    merges = [(a, b)]
    unit = a + b
    for _ in range(levels - 1):
        merges.append((unit, unit))
        unit = unit + unit
    return merges


def encode_len(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count of one word under the classic greedy BPE loop: start
    from characters; repeatedly merge ALL occurrences (left-to-right,
    non-overlapping) of the lowest-ranked adjacent pair present; stop when
    no adjacent pair is in the table. Deterministic for any input."""
    seq = list(word)
    while len(seq) > 1:
        best = None
        best_rank = None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best = (seq[i], seq[i + 1])
        if best is None:
            break
        merged = best[0] + best[1]
        out = []
        i = 0
        while i < len(seq):
            if (i < len(seq) - 1 and seq[i] == best[0]
                    and seq[i + 1] == best[1]):
                out.append(merged)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return len(seq)


def train_bpe(texts: Iterable[str], n_merges: int = 256) -> list[tuple[str, str]]:
    """Learn a ranked merges list: count whitespace words, then repeatedly
    merge the most frequent adjacent symbol pair (ties broken by the pair
    itself, lexicographically — NO dependence on dict iteration order, so
    the result is identical across runs/machines). The classic
    Sennrich-style procedure, O(n_merges * vocab)."""
    vocab = Counter()
    for t in texts:
        for w in (t or "").split():
            vocab[w] += 1
    # word -> symbol tuple
    words: dict[tuple[str, ...], int] = {}
    for w, n in vocab.items():
        words[tuple(w)] = words.get(tuple(w), 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for sym, n in words.items():
            out = []
            i = 0
            while i < len(sym):
                if (i < len(sym) - 1 and sym[i] == best[0]
                        and sym[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + n
        words = new_words
    return merges


def train_bpe_from_df(df: DataFrame, text_col: str = "text",
                      n_merges: int = 256,
                      sample_rows: int = 10_000,
                      seed: int = 42) -> list[tuple[str, str]]:
    """Driver-side training over a BOUNDED portable sample (md5-coin rows
    via limit on a seeded sort would shuffle; a hash-ordered limit is
    enough for vocabulary statistics and costs one bounded collect)."""
    rows = (df.select(F.col(text_col).alias("t"))
            .orderBy(F.md5(F.concat(F.lit(str(seed)),
                                    F.coalesce(F.col(text_col), F.lit("")))))
            .limit(sample_rows).collect())
    return train_bpe((r.t for r in rows), n_merges=n_merges)


def bpe_token_count_udf(df_or_spark, merges: list[tuple[str, str]]):
    """pandas_udf: text -> int token count under `merges`. The ranks dict
    rides a Spark broadcast (one copy per executor); per-batch word
    memoization collapses the repeated web vocabulary."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    bc = spark.sparkContext.broadcast(
        {tuple(p): i for i, p in enumerate(merges)})

    @pandas_udf("int")
    def n_bpe(texts: pd.Series) -> pd.Series:
        ranks = bc.value
        memo: dict[str, int] = {}
        out = []
        for t in texts:
            n = 0
            for w in (t or "").split():
                c = memo.get(w)
                if c is None:
                    c = encode_len(w, ranks)
                    memo[w] = c
                n += c
            out.append(n)
        return pd.Series(out, dtype="int32")

    return n_bpe


def bpe_token_count(df: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = "text",
                    out_col: str = "n_bpe2_tokens") -> DataFrame:
    """Add a real-BPE token count column. NULL text counts 0 (total).

    Python-UDF operator, so the input gets the single-split widening
    guard (a sub-128MB one-file table scans as ONE task and would
    serialize the whole encode pass on one core — the standing
    ensure_parallelism contract)."""
    from llmap_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    udf = bpe_token_count_udf(df, merges)
    return df.withColumn(out_col, udf(F.col(text_col)))
