"""Shared mapInPandas scaffolding for payload-kernel wrappers.

Three operators (media features, PDF text, media header metadata) share
the exact same Arrow shape: run a per-batch kernel over one binary/payload
column while carrying a set of key columns through the boundary untouched.
One helper owns the carry-DDL construction, the batch loop, and the
keep-column re-attachment — a bug fixed here is fixed for every wrapper.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def map_with_carry(df: DataFrame, payload_col: str,
                   keep_cols: tuple[str, ...],
                   out_schema_body: str,
                   batch_fn: Callable[[pd.Series], pd.DataFrame]) -> DataFrame:
    """Apply `batch_fn` (payload Series -> same-length output DataFrame
    matching `out_schema_body`) per Arrow batch, prepending `keep_cols`
    passed through unchanged."""
    cols = list(keep_cols) + [payload_col]
    dtypes = dict(df.dtypes)
    carry_ddl = ", ".join(f"{c} {dtypes[c]}" for c in keep_cols)
    out_schema = (carry_ddl + ", " if carry_ddl else "") + out_schema_body

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            out = batch_fn(pdf_[payload_col]).reset_index(drop=True)
            # keep_cols re-attach by POSITION: a batch_fn that filters or
            # fans out rows would silently pair payloads with wrong keys
            # (this helper is 1:1 by contract; plans/pipeline._carry has
            # the same assert)
            assert len(out) == len(pdf_), (
                f"map_with_carry batch_fn returned {len(out)} rows for "
                f"{len(pdf_)} inputs; the carry contract is 1:1")
            for c in reversed(list(keep_cols)):
                out.insert(0, c, pdf_[c].reset_index(drop=True))
            yield out

    return df.select(*cols).mapInPandas(fn, out_schema)
