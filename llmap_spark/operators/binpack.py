"""Collate / bin-packing operators (reference `collate`, llmap.py:23-64).

The reference greedily packs texts into groups under a token budget to
amortize per-request fixed cost. Two Spark restatements:

  collate_approx  running-sum window: group id = floor(exclusive-prefix-sum
                  / budget). One window over a chosen ordering; exactly
                  expressible in ANSI SQL (the DuckDB oracle runs the same
                  window), deterministic, single shuffle. Groups can
                  overflow the budget by at most one item — the standard
                  streaming-binpack approximation.

  collate_greedy  exact reference semantics (close current bin when the
                  next item would overflow; oversized items get their own
                  bin, mirroring llmap.py:35-44's `large` split). Greedy
                  packing is inherently sequential, so it runs per
                  partition key via applyInPandas; pytest pins it against
                  a pure-Python reimplementation of the reference loop.

At 100 TB you never run a single global ordering: pass `partition_col`
(e.g. a url-hash bucket) so each bucket packs independently in parallel;
the global variant exists for oracle parity and small dimension tables.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def collate_approx(df: DataFrame, order_col: str, size_col: str,
                   budget: int, partition_col: str | None = None,
                   out_col: str = "group_id") -> DataFrame:
    """NB: `order_col` must be UNIQUE within each partition_col group —
    with ties the window order (and hence group ids) is nondeterministic
    run-to-run, breaking the determinism-by-sorting contract. Same
    requirement for collate_greedy's per-group sort."""
    w = (Window.partitionBy(partition_col) if partition_col else
         Window.partitionBy(F.lit(1)))
    w = w.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    prefix = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn(out_col, F.floor(prefix / F.lit(budget)).cast("long"))


def greedy_pack(sizes: Iterable[int], budget: int) -> list[int]:
    """Pure-Python greedy bin packing — the reference's collate loop
    restated (llmap.py:23-64): close the bin when the next item would
    overflow; items >= budget are solo bins.

    Totality rules: a None/NaN size counts as 0 (matching collate_approx,
    whose F.sum skips NULLs — a NaN accumulator would otherwise never
    close another bin); bin occupancy is tracked EXPLICITLY, not via
    acc > 0, so an oversized item after zero-size items still gets its
    solo bin (empty-shell docs legitimately have size 0)."""
    out, cur, acc, n_in_bin = [], 0, 0, 0
    for s in sizes:
        if s is None or s != s:  # None or NaN
            s = 0
        if s >= budget:
            if n_in_bin > 0:
                cur += 1
            out.append(cur)
            cur += 1
            acc = 0
            n_in_bin = 0
            continue
        if acc + s > budget and n_in_bin > 0:
            cur += 1
            acc = 0
            n_in_bin = 0
        out.append(cur)
        acc += s
        n_in_bin += 1
    return out


def collate_greedy(df: DataFrame, order_col: str, size_col: str,
                   budget: int, partition_col: str | None = None,
                   out_col: str = "group_id") -> DataFrame:
    from pyspark.sql.types import LongType, StructField, StructType

    key = partition_col
    cols = [c for c in df.columns]
    # NB: StructType.add() mutates in place and df.schema is cached — build
    # a fresh StructType or the *input* DataFrame's schema grows a column
    schema = StructType(list(df.schema.fields) + [StructField(out_col, LongType())])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        pdf[out_col] = greedy_pack(pdf[size_col].tolist(), budget)
        return pdf

    grouped = df.groupBy(key) if key else df.groupBy(F.lit(1).alias("_one"))
    out = grouped.applyInPandas(pack, schema=schema)
    return out.select(*cols, out_col)
