"""Portable, engine-exact sampling operators for corpus curation.

Spark's df.sample() seeds its RNG per PARTITION INDEX: the selected set
changes whenever the input partitioning does, so a sampled corpus is not
reproducible across cluster sizes or AQE decisions. Every sampler here
derives its coin from md5(seed:key) — a pure function of the ROW — so the
same (seed, key) lands on the same side of the gate on any engine, any
partitioning, any cluster size. That also makes every sampler exactly
SQL-oracle-able (the driver hash-verifies them against DuckDB).

All gates are integer basis-point comparisons (Arrow-boundary safe, no
float thresholds), evaluated inside whole-stage codegen: map-only, zero
shuffles, zero Python. Reference analogue: the random-sample stage of
llmap's file funnel (SURVEY.md §2 #8), generalized to the weighted /
stratified forms a training-data pipeline needs (downsample dominant
languages, upsample high-quality text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BP = 10_000  # basis points: rates are integer ten-thousandths


def portable_coin(key: Column, seed: int, mod: int = BP) -> Column:
    """Deterministic per-row coin in [0, mod): the first 8 hex digits of
    md5('<seed>:<key>') mod `mod`. Identical in Spark, DuckDB, and plain
    Python — the basis of every portable sampler.

    NULL keys coalesce to a fixed sentinel rather than poisoning the md5
    to NULL — an unconditioned NULL coin fails every `coin < rate` gate,
    so NULL-key rows would vanish from even a 100% sample (silent row
    loss, against the repo's totality rule). With the sentinel they all
    share one coin: kept or dropped TOGETHER, deterministically; corpora
    with meaningful NULL-key populations should assign ids first."""
    k = F.coalesce(key.cast("string"), F.lit("\x00null"))
    return (
        F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), k)), 1, 8),
            16, 10).cast("long") % mod
    )


def bernoulli_sample(df: DataFrame, rate_bp: int, seed: int = 42,
                     key_col: str = "doc_id") -> DataFrame:
    """Keep each row with probability rate_bp/10000, reproducibly."""
    return df.filter(portable_coin(F.col(key_col), seed) < F.lit(rate_bp))


def stratified_sample(df: DataFrame, rates_bp: dict[str, int],
                      strata_col: str = "lang", default_bp: int = 0,
                      seed: int = 42,
                      key_col: str = "doc_id") -> DataFrame:
    """Per-stratum Bernoulli rates in basis points — the language-rebalance
    primitive (e.g. keep 10% of English, 80% of the long tail). Strata not
    listed in rates_bp fall back to default_bp. One CASE expression plus
    the coin: map-only, no shuffle, no per-stratum passes."""
    gate = None
    col = F.col(strata_col)
    for k, v in rates_bp.items():
        gate = (F.when(col == k, F.lit(v)) if gate is None
                else gate.when(col == k, F.lit(v)))
    rate = gate.otherwise(F.lit(default_bp)) if gate is not None \
        else F.lit(default_bp)
    return df.filter(portable_coin(F.col(key_col), seed) < rate)


def weighted_sample(df: DataFrame, weight_bp_col: str, seed: int = 42,
                    key_col: str = "doc_id") -> DataFrame:
    """Keep each row with its OWN probability weight_bp/10000 (a per-row
    integer column — e.g. a quality score mapped to a keep rate, so
    high-quality documents survive curation sampling preferentially).

    NULL weight = keep rate 0, EXPLICITLY (coalesce): a bare
    `coin < NULL` comparison is NULL and the filter would drop the row
    anyway, but silently — via SQL three-valued logic rather than a
    stated rule. Unknown quality never survives a quality-weighted
    sample; assign weights first if that is not the intent."""
    return df.filter(
        portable_coin(F.col(key_col), seed)
        < F.coalesce(F.col(weight_bp_col), F.lit(0)))
