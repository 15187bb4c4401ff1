"""spark-submit entry point for parquet small-file compaction.

Usage::

    spark-submit --py-files dist/pdf_parser_spark.zip jobs/compact_job.py \
        --src s3://bucket/table/ --dst s3://bucket/table_compacted/ \
        [--target-mb 128] [--zorder-cols user_id,value] [--zorder-bits 4]

Prints ONE JSON accounting line (in/out file counts and bytes, rows,
layout). The destination must be a NEW directory; swap table pointers
after the job reports success (compact-in-place would destroy the
source on a mid-write failure).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description="compact parquet small files")
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--target-mb", type=int, default=128)
    ap.add_argument("--zorder-cols", default=None,
                    help="comma-separated columns: compaction doubles as "
                         "the Z-curve clustering rewrite")
    ap.add_argument("--zorder-bits", type=int, default=4)
    a = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from pdf_parser_spark.sources.compact import compact_parquet

    spark = SparkSession.builder.appName("compact").getOrCreate()
    try:
        stats = compact_parquet(
            spark, a.src, a.dst, target_mb=a.target_mb,
            zorder_cols=(a.zorder_cols.split(",") if a.zorder_cols
                         else None),
            zorder_bits=a.zorder_bits)
        print(json.dumps(stats))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
