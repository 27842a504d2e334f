"""Streaming exact deduplication — the ingest-time twin of batch
exact_dedup.

A crawl stream re-fetches pages constantly; deduping at ingest keeps
downstream extraction from paying for recrawls. State is the crux at
stream scale: a plain dropDuplicates grows keyed state forever, while
dropDuplicatesWithinWatermark bounds it to the event-time horizon — the
only shape that survives an unbounded 100 TB/day stream. Content identity
is md5 over the raw payload (JVM-side), keyed independently of url so
mirrors/alias urls dedup too.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def dedup_pages_stream(spark: SparkSession, pages_path: str,
                       watermark: str = "1 hour",
                       query_name: str = "dedup_pages"):
    """First occurrence per content fingerprint within the watermark
    horizon. Returns the started query (memory sink; caller drives it —
    processAllAvailable in tests). Emits (url, warc_ts, fingerprint)."""
    pages = (spark.readStream.schema(PAGES_DDL).format("parquet")
             .load(pages_path))
    fp = pages.withColumn("fingerprint", F.md5(F.col("html")))
    # NULL html = UNKNOWN content, never a duplicate (same rule as batch
    # exact_dedup): dropDuplicates treats nulls as EQUAL, so without the
    # split every null-payload page after the first would be silently
    # dropped from ingest
    deduped = (
        fp.filter(F.col("fingerprint").isNotNull())
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
        .select("url", "warc_ts", "fingerprint")
    )
    passthrough = (fp.filter(F.col("fingerprint").isNull())
                   .select("url", "warc_ts", "fingerprint"))
    out = deduped.unionByName(passthrough)
    return (out.writeStream.outputMode("append").format("memory")
            .queryName(query_name).start())
