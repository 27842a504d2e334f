"""Thin spark-submit main around the library API (SURVEY §3.2 shape:
`extract(df, cfg) -> (extracted, lineage)` as a library, CLI on top).

    spark-submit --py-files engine.zip llmap_spark/run_extract.py ...  # or:
    python -m llmap_spark.run_extract \
        --input  /path/to/pages_parquet \
        --output /path/to/output_root \
        [--repartition 0] [--n-salts 8] [--staged] [--cores 32]

Runs one snapshot commit (resuming past committed urls), prints a JSON
summary line. Safe to re-run: completed inputs are a no-op.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="pages parquet dir")
    ap.add_argument("--output", required=True, help="snapshot output root")
    ap.add_argument("--repartition", type=int, default=0,
                    help="explicit salted url-hash repartition; 0 = map-only")
    ap.add_argument("--n-salts", type=int, default=8)
    ap.add_argument("--staged", action="store_true",
                    help="use the two-UDF funnel plan instead of the fused pass")
    ap.add_argument("--cores", type=int, default=None,
                    help="local mode cores (ignored under a real master)")
    args = ap.parse_args(argv)

    from pyspark import SparkConf
    from pyspark.sql import SparkSession

    from llmap_spark.plans.pipeline import ExtractConfig
    from llmap_spark.sources.snapshot import run_extract_job

    if SparkConf().contains("spark.master"):
        # launched via spark-submit: NEVER override --master (a fresh
        # spark-submit driver has no active session yet, so detecting the
        # launcher via getActiveSession() is wrong — the conf check isn't)
        spark = SparkSession.builder.appName("llmap-extract").getOrCreate()
    else:
        from llmap_spark.session import get_spark, scan_conf_for

        cores = args.cores or 32
        spark = get_spark(app_name="llmap-extract",
                          cores=cores,
                          extra_conf=scan_conf_for(args.input, cores))

    cfg = ExtractConfig(repartition=args.repartition, n_salts=args.n_salts,
                        fuse=not args.staged)
    snap = run_extract_job(spark, spark.read.parquet(args.input),
                           args.output, cfg)
    if snap is None:
        print(json.dumps({"status": "up-to-date", "new_rows": 0}))
    else:
        print(json.dumps({
            "status": "committed", "snapshot_id": snap.snapshot_id,
            "new_rows": snap.n_rows, "data_path": snap.data_path,
            "lineage_path": snap.lineage_path,
            "kernel_version": snap.kernel_version,
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
