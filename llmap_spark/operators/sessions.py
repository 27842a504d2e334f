"""Sessionization + as-of lookup — classic event-pipeline operators.

Both are single-window constructions (one shuffle on the session key),
expressed identically in Spark and ANSI SQL so the DuckDB oracle hashes
them exactly. At scale the window partitions by user_id; AQE handles
skewed users, and no driver-side state exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SESSION_GAP_SECONDS = 1800


def sessionize(events: DataFrame, gap: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Assign session ids per user: a new session starts when the gap to
    the previous event exceeds `gap` seconds. Ordering ties broken by
    event_id (determinism-by-sorting, reference llmap.py:209-213)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag(F.unix_timestamp("ts")).over(w)
    new_sess = F.when(
        prev_ts.isNull() | (F.unix_timestamp("ts") - prev_ts > gap), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"))


def asof_prior_event(events: DataFrame, event_type: str = "purchase",
                     out_col: str = "prev_purchase_id") -> DataFrame:
    """For each event: the user's most recent STRICTLY EARLIER event of
    `event_type` (an as-of join against the same stream, emulated with
    last_value IGNORE NULLS over an unbounded-preceding window — Spark has
    no native as-of join; this is the standard restatement)."""
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    marker = F.when(F.col("event_type") == event_type, F.col("event_id"))
    return events.withColumn(out_col, F.last(marker, ignorenulls=True).over(w))
