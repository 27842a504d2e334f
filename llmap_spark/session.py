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


def scan_conf_for(input_path: str, cores: int, splits_per_core: int = 3) -> dict:
    """Size maxPartitionBytes so the SCAN stage saturates the cluster.

    Spark bin-packs small files up to maxPartitionBytes per split; with one
    fat file (or default 128m) a few hundred MB of input yields 2-3 splits
    and the whole first stage runs ~3-way parallel regardless of cores
    (measured — see ARCHITECTURE.md). Target ~splits_per_core splits/core,
    clamped to [4 MiB, 128 MiB]. At real 100 TB scale the default 128m is
    already right; this matters for small-corpus local runs.
    """
    import pathlib

    p = pathlib.Path(input_path)
    total = sum(f.stat().st_size for f in p.rglob("*") if f.is_file()) \
        if p.is_dir() else p.stat().st_size
    target = max(4 << 20, min(128 << 20, total // max(1, splits_per_core * cores)))
    return {
        "spark.sql.files.maxPartitionBytes": str(target),
        "spark.sql.files.openCostInBytes": str(1 << 20),
    }


def get_spark(app_name: str = "llmap_spark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = 2 * cores
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
        # zstd shuffle/spill/broadcast blocks: markedly better ratio than
        # the lz4 default at similar speed — fewer bytes to disk and (on a
        # cluster) across the NIC; measured 2.14s -> 1.97s best-of-3 on
        # the salted-shuffle extract at sf0.1, and the win grows with
        # shuffle volume. Env-overridable for A/B.
        .config("spark.io.compression.codec",
                os.environ.get("LLMAP_SHUFFLE_CODEC", "zstd"))
        .config("spark.driver.memory", os.environ.get("LLMAP_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # getOrCreate returns any EXISTING session and silently ignores the
    # builder confs — re-apply the runtime-settable ones (spark.sql.*) so
    # a second get_spark() call in the same process still gets its scan
    # sizing and shuffle partitions; static confs (master, memory) can't
    # change on a live session and are skipped.
    runtime = {"spark.sql.shuffle.partitions": str(shuffle_partitions),
               **{k: str(v) for k, v in (extra_conf or {}).items()}}
    for k, v in runtime.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime conf on an existing session
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_parallelism(df):
    """Small corpora often scan as ONE task (a sub-128MB parquet file is a
    single split), which would serialize every downstream Python UDF on
    one core. Repartition up to the cluster's default parallelism when the
    incoming plan has fewer partitions — a no-op for real multi-split
    corpora (partitions >= cores), so at 100 TB this adds nothing, while
    the sf0.1 documents table (one 0.6 MB file) goes from a 1-core
    signature pass to a full-width one. Call it on the SLIM projection
    feeding the UDF so the introduced exchange carries only (id, payload).

    Shuffle-bearing plans (joins/aggregates/windows/...) are returned
    UNTOUCHED, for two reasons: their output is already
    shuffle.partitions wide, and — the sharp edge — probing
    .rdd.getNumPartitions() under AQE EXECUTES every upstream query
    stage just to learn the count, whose results the fresh repartitioned
    plan would then throw away and recompute. The probe is only free on
    exchange-less plans (scan + project/filter/generate), which is
    exactly where the single-split problem lives.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # Positive exchange test on the PHYSICAL plan (planning is lazy — this
    # executes nothing): any Exchange (shuffle or broadcast) means the
    # probe below would eagerly run upstream stages under AQE, and the
    # output is already shuffle.partitions wide anyway. A keyword
    # denylist over logical nodes missed grouped-map shapes
    # (FlatMapGroupsInPandas et al.) and false-matched user identifiers.
    #
    # The probe uses the PRIVATE _jdf handle (no public API exposes the
    # physical plan without executing); if a Spark upgrade moves it, fail
    # SAFE — return the frame unchanged rather than risk the eager-AQE
    # partition probe on a shuffle-bearing plan. The probe's continued
    # validity on the running Spark version is pinned by
    # tests/test_plans.py::test_ensure_parallelism_probe_detects_exchange.
    try:
        phys = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return df
    if "Exchange" in phys:
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
