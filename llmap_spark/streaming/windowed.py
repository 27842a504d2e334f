"""Structured Streaming variants of the batch operators.

The reference has NOTHING streaming (SURVEY.md §2 end note) — resumability
there is a response cache we map to snapshot anti-join resume. These
operators are the *additive* streaming surface a web-scale ingest pipeline
needs: windowed event aggregation with watermarked late-data handling, and
a streaming run of the extraction kernel (the kernel is a pure map, so it
lifts to readStream unchanged).

Each streaming op has a batch twin with identical semantics; tests run the
stream to completion over the same parquet input (memory sink +
processAllAvailable) and assert equality with the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from llmap_spark.plans.pipeline import ExtractConfig, extract

EVENTS_DDL = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def windowed_counts_batch(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Batch twin: tumbling-window counts/sums per event_type. Uses
    integer epoch bucketing so the DuckDB oracle can run the same query
    (window() structs don't travel to SQL cleanly)."""
    bucket = (F.floor(F.unix_timestamp("ts") / (minutes * 60))
              * (minutes * 60)).cast("long")
    return (
        events.groupBy(bucket.alias("win_start"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"))
    )


def windowed_counts_stream(spark: SparkSession, src_path: str,
                           minutes: int = 5, watermark: str = "10 minutes",
                           query_name: str = "windowed_counts"):
    """Streaming variant: watermarked tumbling window. Returns the started
    query; caller drives it (processAllAvailable for tests)."""
    events = (spark.readStream.schema(EVENTS_DDL).format("parquet")
              .load(src_path))
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"))
        .select(F.unix_timestamp("window.start").cast("long").alias("win_start"),
                "event_type", "n_events", "sum_value")
    )
    return (agg.writeStream.outputMode("complete").format("memory")
            .queryName(query_name).start())


def extract_stream(spark: SparkSession, pages_path: str, out_path: str,
                   checkpoint: str, cfg: ExtractConfig = ExtractConfig(),
                   query_name: str = "extract_stream"):
    """Streaming extraction: the same `extract()` plan over readStream.
    The kernel is a stateless per-row map, so watermarks/state are not
    needed; checkpointing gives exactly-once file-sink semantics — the
    streaming analogue of the snapshot/anti-join resume used in batch."""
    from llmap_spark.streaming.dedup import PAGES_DDL  # single DDL source

    pages = spark.readStream.schema(PAGES_DDL).format("parquet").load(pages_path)
    ex = extract(pages, cfg)
    return (ex.writeStream.format("parquet").outputMode("append")
            .option("path", out_path).option("checkpointLocation", checkpoint)
            .queryName(query_name).start())
