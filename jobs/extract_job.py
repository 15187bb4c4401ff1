"""spark-submit entry point for the extraction pipeline.

Cluster usage (the north-rule packaging contract)::

    python jobs/package.py                      # builds dist/pdf_parser_spark.zip
    spark-submit --py-files dist/pdf_parser_spark.zip \
        jobs/extract_job.py \
        --input  s3://bucket/transcripts/       # or an Iceberg table path
        --output s3://bucket/extraction_run1/ \
        --n-buckets 4096 --buckets-per-job 64 \
        [--resume] [--clean-boilerplate] [--tokenizer paragraphs]

Local smoke (what the packaging test runs)::

    spark-submit --master local[4] --py-files dist/pdf_parser_spark.zip \
        jobs/extract_job.py --input /tmp/in.parquet --output /tmp/out

The job is resumable: per-bucket lineage rows mark completed work and a
restart with --resume skips them (sources/lineage.py). All tuning configs
(AQE, Arrow batch size, shuffle partitions) come from the session builder;
anything can be overridden with ordinary ``spark-submit --conf`` flags,
which take precedence over an existing session's defaults.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser(description="transcripts -> extracted chunks")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--buckets-per-job", type=int, default=8)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-resume", dest="resume", action="store_false")
    ap.add_argument("--clean-boilerplate", action="store_true")
    ap.add_argument("--tokenizer", default="turn",
                    choices=["turn", "paragraphs"])
    ap.add_argument("--max-chars", type=int, default=800)
    ap.add_argument("--overlap-chars", type=int, default=0)
    ap.set_defaults(resume=True)
    args = ap.parse_args(argv)

    # imports AFTER arg parsing so --help works without the zip on sys.path
    from pyspark.sql import SparkSession

    from pdf_parser_spark.config import ExtractionConfig
    from pdf_parser_spark.sources.lineage import run_extraction

    cfg = ExtractionConfig(
        max_chars_per_chunk=args.max_chars,
        tokenizer_mode=args.tokenizer,
        clean_boilerplate=args.clean_boilerplate,
        overlap_chars=args.overlap_chars,
    )
    # spark-submit provides master/deploy config; just attach
    spark = SparkSession.builder.appName("pdf_parser_spark-extract") \
        .getOrCreate()
    try:
        result = run_extraction(
            spark, args.input, args.output, cfg,
            n_buckets=args.n_buckets, buckets_per_job=args.buckets_per_job,
            resume=args.resume)
        print(json.dumps({
            "processed_buckets": result.processed_buckets,
            "skipped_buckets": result.skipped_buckets,
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
