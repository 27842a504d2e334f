"""SparkSession builder with scale-appropriate defaults.

Local mode here is the test harness; the confs are chosen so the same plan
shape survives a 1000-executor cluster: AQE on (skew-join + partition
coalescing), Arrow batches sized so binary HTML columns keep Python workers
memory-bounded, UTC timezone pinned for oracle comparability.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# HTML blobs are big: small Arrow batches bound per-batch worker memory
# (SURVEY §4.3 — "batches of ~64-256 rows").
ARROW_BATCH_ROWS = 256


def get_spark(app_name: str = "llmap_spark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 2 * cores)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("LLMAP_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
