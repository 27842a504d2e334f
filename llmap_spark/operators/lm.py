"""Character n-gram language-model scoring — the CCNet/KenLM-style
perplexity quality filter, restated engine-exact.

Pretraining pipelines rank documents by LM perplexity and drop the worst
tail. A float log-prob sum is not hash-comparable across engines, so the
model TABLE stores integer MILLI-BITS per gram (quantized once at
training time, driver-side); scoring is then pure integer addition and
division — the same integer-arithmetic discipline as every other scored
operator here.

  train_char_lm(texts, n)     gram -> milli-bits table + OOV cost from a
                              bounded corpus sample (driver-side, like
                              bpe.train_bpe_from_df; deterministic)
  lm_score(df, model, ...)    per-doc (n_grams, millibits_total,
                              avg_millibits) via a broadcast table and an
                              Arrow-batched UDF

Lower avg_millibits = more typical text; junk/garbled text scores high.
The model is an unconditional n-gram distribution (a trigram unigram
model, not a backoff chain) — the standard cheap filter; documents
shorter than n grams score (0, 0, 0) and are the caller's length-gate
problem.

Scale: the table is vocabulary-sized (<= alphabet^n entries, ~100k for
byte trigrams), shipped once per executor via broadcast; scoring is
map-only. Training never scans the corpus — a seeded bounded sample is
collected exactly as the BPE trainer does.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F

LM_SCHEMA = "n_grams int, millibits_total long, avg_millibits int"


def _grams(text: str, n: int) -> Iterable[str]:
    t = text or ""
    for i in range(len(t) - n + 1):
        yield t[i:i + n]


def train_char_lm(texts: Iterable[str], n: int = 3,
                  max_vocab: int = 200_000) -> tuple[dict[str, int], int]:
    """-> (gram -> milli-bits, oov_millibits). Milli-bits are
    round(-log2(count/total) * 1000); OOV costs one-count-in-(total+1).
    Deterministic: vocabulary truncation (rarest first) breaks ties
    lexicographically."""
    counts: Counter = Counter()
    for t in texts:
        counts.update(_grams(t, n))
    if not counts:
        return {}, 0
    if len(counts) > max_vocab:
        keep = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
        counts = Counter(dict(keep))
    total = sum(counts.values())
    model = {g: round(-math.log2(c / total) * 1000)
             for g, c in counts.items()}
    oov = round(-math.log2(1 / (total + 1)) * 1000)
    return model, oov


def train_char_lm_from_df(df: DataFrame, text_col: str = "text",
                          n: int = 3, sample_rows: int = 10_000,
                          seed: int = 42) -> tuple[dict[str, int], int]:
    """Driver-side training over a bounded seeded sample (hash-ordered
    TakeOrdered limit — per-partition top-k, no full sort)."""
    rows = (df.select(F.col(text_col).alias("t"))
            .orderBy(F.md5(F.concat(F.lit(str(seed)),
                                    F.coalesce(F.col(text_col), F.lit("")))))
            .limit(sample_rows).collect())
    return train_char_lm((r.t for r in rows), n=n)


def lm_score(df: DataFrame, model: dict[str, int], oov_millibits: int,
             n: int = 3, text_col: str = "text") -> DataFrame:
    """Add (n_grams, millibits_total, avg_millibits) per row. NULL/short
    text scores (0, 0, 0) — total. The model rides one broadcast per
    executor; scoring is integer-only so the result hashes identically
    in any engine given the same table."""
    from pyspark.sql.functions import pandas_udf

    from llmap_spark.session import ensure_parallelism

    # the standing Python-UDF contract: widen a single-split scan so the
    # scoring pass doesn't serialize on one core
    df = ensure_parallelism(df)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((dict(model), int(oov_millibits), n))

    @pandas_udf(f"struct<{LM_SCHEMA}>")
    def score(texts: pd.Series) -> pd.DataFrame:
        m, oov, nn = bc.value
        rows = {"n_grams": [], "millibits_total": [], "avg_millibits": []}
        for t in texts:
            total = 0
            k = 0
            for g in _grams(t or "", nn):
                total += m.get(g, oov)
                k += 1
            rows["n_grams"].append(k)
            rows["millibits_total"].append(total)
            rows["avg_millibits"].append(total // k if k else 0)
        return pd.DataFrame(rows)

    out = df.withColumn("_lm", score(F.col(text_col)))
    return (out.select(*df.columns,
                       F.col("_lm.n_grams").alias("n_grams"),
                       F.col("_lm.millibits_total").alias("millibits_total"),
                       F.col("_lm.avg_millibits").alias("avg_millibits")))
