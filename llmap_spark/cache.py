"""Session-scoped registry for operator-persisted DataFrames.

Several operators (minhash_lsh_candidates, hamming_band_pairs, the
curation chain) persist an intermediate frame because multiple consumers
share an expensive UDF subtree. Under their lazy default
(materialize=False) the operator cannot know when the caller is done, so
the persisted block would otherwise pin executor storage for the life of
the session — a leak-by-default API in long-lived apps.

Every such persist is registered here; callers release them explicitly:

    from llmap_spark.cache import release_persisted
    ...run queries...
    release_persisted()          # unpersists everything registered

This is narrower than spark.catalog.clearCache() (which would also evict
caches the APPLICATION owns) and makes the lifetime contract visible at
the call site. materialize=True paths unpersist eagerly and never
register.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def register_persisted(df: DataFrame) -> DataFrame:
    """Record an operator-persisted frame for later release; returns it."""
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every registered frame (idempotent; unpersisting an
    already-released frame is a Spark no-op). Returns the count released."""
    n = len(_PERSISTED)
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # a stopped session invalidates handles; releasing is moot
    return n
