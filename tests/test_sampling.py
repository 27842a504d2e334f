"""Portable samplers: partitioning invariance, rate behavior, strata."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from llmap_spark.operators.sampling import (bernoulli_sample, portable_coin,
                                            stratified_sample,
                                            weighted_sample)


def _py_coin(seed: int, key, mod: int = 10_000) -> int:
    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:8], 16) % mod


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_coin_matches_python_and_rate(spark, docs):
    got = {r.doc_id: r.c for r in docs.select(
        "doc_id", portable_coin(F.col("doc_id"), 42).alias("c")).collect()}
    assert got == {d: _py_coin(42, d) for d in got}
    kept = bernoulli_sample(docs, rate_bp=5000).count()
    assert 200 <= kept <= 300  # ~50% of 500 docs


def test_sample_is_partitioning_invariant(spark, docs):
    """The property Spark's sample() lacks: repartitioning must not change
    the selected set (per-partition RNG seeds would)."""
    a = {r.doc_id for r in bernoulli_sample(docs, 3000).collect()}
    b = {r.doc_id for r in
         bernoulli_sample(docs.repartition(7), 3000).collect()}
    c = {r.doc_id for r in
         bernoulli_sample(docs.coalesce(1), 3000).collect()}
    assert a == b == c
    # different seed -> different set
    d = {r.doc_id for r in bernoulli_sample(docs, 3000, seed=7).collect()}
    assert a != d


def test_rates_nest_for_fixed_seed(spark, docs):
    """The coin is fixed per (seed, key), so a lower rate selects a strict
    subset of a higher rate — stable incremental sampling."""
    lo = {r.doc_id for r in bernoulli_sample(docs, 1000).collect()}
    hi = {r.doc_id for r in bernoulli_sample(docs, 6000).collect()}
    assert lo < hi


def test_stratified_sample_respects_strata(spark, docs):
    out = stratified_sample(docs, {"en": 10_000, "de": 0}, default_bp=0)
    rows = out.select("doc_id", "lang").collect()
    n_en = docs.filter("lang = 'en'").count()
    assert all(r.lang == "en" for r in rows)
    assert len(rows) == n_en  # rate 10000 keeps every English doc
    # unlisted strata fall back to default_bp
    tail = stratified_sample(docs, {"en": 0}, default_bp=10_000)
    assert {r.lang for r in tail.collect()} == \
        {r.lang for r in docs.filter("lang <> 'en'").collect()}


def test_null_keys_are_total_not_dropped(spark):
    """A NULL key must not silently vanish from the sample (the coin
    coalesces to a sentinel; all NULL-key rows flip together)."""
    df = spark.createDataFrame(
        [(1,), (None,)], "doc_id long")
    assert bernoulli_sample(df, 10_000).count() == 2  # 100% keeps ALL rows
    assert bernoulli_sample(df, 0).count() == 0


def test_weighted_sample_per_row_gate(spark):
    rows = [(i, 0 if i % 2 == 0 else 10_000) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    kept = {r.doc_id for r in weighted_sample(df, "w").collect()}
    assert kept == {i for i in range(100) if i % 2 == 1}
