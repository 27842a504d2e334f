"""Thin spark-submit main for the training-data curation chain
(plans/training.py: quality gate -> exact dedup -> MinHash LSH -> verify
-> connected components -> keep list).

    spark-submit --py-files engine.zip llmap_spark/run_curate.py ...  # or:
    python -m llmap_spark.run_curate \
        --input  /path/to/documents_parquet \
        --output /path/to/kept_parquet \
        [--verify-jaccard 0.5] [--cores 32] \
        [--emit corpus --benchmark /path/to/benchmark_parquet]

Writes the kept (doc_id) list as parquet (or, with --emit corpus, the
scrubbed training-ready text: decontaminated, paragraph-deduped, PII-
redacted) and prints a JSON summary line.
Unlike extraction, global dedup is NOT incrementally resumable (a new doc
can demote a previously kept one), so this job is an overwrite, not a
snapshot append — re-running recomputes the keep list for the full input.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet")
    ap.add_argument("--output", required=True, help="kept-ids parquet dir")
    ap.add_argument("--verify-jaccard", type=float, default=0.5,
                    help="LSH signature-agreement verify threshold")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--cores", type=int, default=None,
                    help="local mode cores (ignored under a real master)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="reliable checkpoint location (HDFS/S3/local dir); "
                         "when set, the component iteration uses cluster "
                         "checkpoints that survive executor loss instead of "
                         "localCheckpoint")
    ap.add_argument("--emit", choices=["kept", "corpus"], default="kept",
                    help="'kept' writes the keep-list ids; 'corpus' writes "
                         "the scrubbed training-ready text (keep-list -> "
                         "decontaminate -> paragraph dedup -> PII redact)")
    ap.add_argument("--benchmark", default=None,
                    help="held-out benchmark parquet (text column) for "
                         "decontamination; only used with --emit corpus")
    ap.add_argument("--nfc", action="store_true",
                    help="NFC-normalize + control-strip text before the "
                         "scrub stages (--emit corpus only)")
    ap.add_argument("--partition-by-lang", action="store_true",
                    help="--emit corpus only: identify each curated doc's "
                         "language (operators/langid.py, 35 languages) and "
                         "write the corpus partitioned by pred_lang — the "
                         "training-pipeline layout where every downstream "
                         "job (per-language sampling, quality, tokenizer "
                         "training) prunes to its language's files")
    args = ap.parse_args(argv)

    from pyspark import SparkConf
    from pyspark.sql import SparkSession

    from llmap_spark.plans.training import kept_documents

    if SparkConf().contains("spark.master"):
        spark = SparkSession.builder.appName("llmap-curate").getOrCreate()
        # UTC pin, same as get_spark: WARC dates parse with a
        # literal 'Z', so a cluster-local timezone would shift
        # every crawl timestamp
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    else:
        from llmap_spark.session import get_spark, scan_conf_for

        cores = args.cores or 32
        spark = get_spark(app_name="llmap-curate", cores=cores,
                          extra_conf=scan_conf_for(args.input, cores))

    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    if args.emit == "corpus":
        from llmap_spark.plans.training import curated_corpus

        bench = (spark.read.parquet(args.benchmark)
                 if args.benchmark else None)
        out = curated_corpus(docs, benchmark=bench, nfc=args.nfc,
                             id_col=args.id_col,
                             text_col=args.text_col,
                             verify_jaccard=args.verify_jaccard,
                             cc_reliable=args.checkpoint_dir is not None,
                             cc_checkpoint_dir=args.checkpoint_dir)
    else:
        out = kept_documents(docs, id_col=args.id_col,
                             text_col=args.text_col,
                             verify_jaccard=args.verify_jaccard,
                             cc_reliable=args.checkpoint_dir is not None,
                             cc_checkpoint_dir=args.checkpoint_dir)
    if args.emit == "corpus" and args.partition_by_lang:
        from pyspark.sql import functions as F

        from llmap_spark.operators.langid import lang_id2

        out = lang_id2(out, text_col=args.text_col).drop(
            "pred_script", "n_letters")
        # pred_lang becomes the physical partition key: downstream
        # per-language jobs read only their directory (partition
        # pruning), the layout a multilingual pipeline filters by first
        out.write.mode("overwrite").partitionBy("pred_lang") \
            .parquet(args.output)
    else:
        out.write.mode("overwrite").parquet(args.output)
    n_kept = spark.read.parquet(args.output).count()
    print(json.dumps({
        "status": "written", "input_rows": n_in, "kept_rows": n_kept,
        "dropped_rows": n_in - n_kept, "output": args.output,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
