"""spark-submit entry point for STREAMING extraction over a landing
directory — the tailing companion to ``jobs/extract_job.py`` (backfill).

Two modes, same output table:

- ``--mode batchwise`` (default): ``streaming/incremental.stream_extract``
  — foreachBatch over whole-conversation landed files; cheapest when the
  ingestion contract (a file holds complete conversations) holds.
- ``--mode stateful``: ``streaming/stateful_extract.stream_extract_stateful``
  — per-conversation counters in the state store, so files may split or
  reorder conversations arbitrarily and the cumulative output still equals
  batch extraction (the measured trade: ~0.3 ms per conversation-touch of
  state protocol; see BASELINE.md "Stateful streaming extraction").

Default trigger is ``availableNow``: one drain of everything new, then
exit — the cron-driven tailing shape, resumable purely from the
checkpoint. ``--follow`` switches to always-on micro-batching
(``--trigger-seconds N`` paces it with a processing-time trigger;
without it, as-fast-as-possible). Stateful mode then accepts
``--state-ttl`` for idle-conversation GC; availableNow drains run
TTL-less by design — see stateful_extract_stream's note on AvailableNow
vs processing-time timers, and note the TTL is a retention boundary
(turns of a GC'd conversation are dropped).

Cluster usage::

    spark-submit --py-files dist/pdf_parser_spark.zip \
        jobs/stream_extract_job.py \
        --input  <landing dir> --output <table dir> \
        --checkpoint <ckpt dir> [--mode stateful] \
        [--max-files-per-trigger N] [--stall-metrics] \
        [--follow [--trigger-seconds 30] [--state-ttl 86400]]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct CLI invocation (python jobs/stream_extract_job.py) runs with
# jobs/ as sys.path[0]; under spark-submit --py-files the zip provides
# the package instead and this insert is a harmless no-op
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser(
        description="landing dir -> streaming extracted chunks")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--mode", default="batchwise",
                    choices=["batchwise", "stateful"])
    ap.add_argument("--sink", default="parquet",
                    choices=["parquet", "cow"],
                    help="cow: land micro-batches as ledgered exactly-once "
                         "appends on the chunk-keyed copy-on-write table at "
                         "--output (created empty if absent); stateful "
                         "mode only")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--follow", action="store_true",
                    help="always-on: keep micro-batching as files land "
                         "instead of one availableNow drain")
    ap.add_argument("--trigger-seconds", type=int, default=None,
                    help="--follow only: pace micro-batches with a "
                         "processing-time trigger")
    ap.add_argument("--compact-after", type=int, default=None,
                    metavar="TARGET_MB",
                    help="after an availableNow drain, publish a compacted "
                         "snapshot of the output (the streaming sink "
                         "accretes one small file per micro-batch; this is "
                         "the small-file rewrite, downstream of the hot "
                         "dir so the stream keeps appending untouched)")
    ap.add_argument("--state-ttl", type=int, default=None,
                    help="stateful mode + --follow only: GC conversations "
                         "idle this many seconds")
    ap.add_argument("--stall-metrics", action="store_true",
                    help="stateful mode + parquet sink only: route "
                         "per-(conversation, micro-batch) gap-stall / "
                         "ttl-drop diagnostic rows to "
                         "<output>/stall_metrics so a dense-turn_idx "
                         "contract violation (or a TTL retention drop) "
                         "is observable instead of silent state growth")
    ap.add_argument("--tokenizer", default="turn",
                    choices=["turn", "paragraphs"])
    ap.add_argument("--max-chars", type=int, default=800)
    ap.add_argument("--overlap-chars", type=int, default=0)
    args = ap.parse_args(argv)

    if args.state_ttl is not None and not args.follow:
        ap.error("--state-ttl requires --follow (an availableNow drain "
                 "with processing-time timers never terminates)")
    if args.state_ttl is not None and args.mode != "stateful":
        ap.error("--state-ttl only applies to --mode stateful")
    if args.trigger_seconds is not None and not args.follow:
        ap.error("--trigger-seconds requires --follow")
    if args.compact_after is not None and args.follow:
        ap.error("--compact-after is a post-drain step; it cannot run "
                 "under --follow (the stream never ends)")
    if args.sink == "cow" and args.mode != "stateful":
        ap.error("--sink cow requires --mode stateful (the cow append "
                 "contract relies on the stateful path's chunk-key "
                 "exactness)")
    if args.sink == "cow" and args.compact_after is not None:
        ap.error("--compact-after applies to the parquet sink; the cow "
                 "table has its own compaction (jobs/compact_job.py / "
                 "rewrite_masked_files)")
    if args.stall_metrics and (args.mode != "stateful"
                               or args.sink == "cow"):
        ap.error("--stall-metrics requires --mode stateful with the "
                 "parquet sink (the batchwise path has no reorder "
                 "buffer to report on; the cow sink's ledgered appends "
                 "do not carry the side table)")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        "pdf_parser_spark-stream-extract").getOrCreate()
    try:
        print(json.dumps(run_job(spark, args)))
    finally:
        spark.stop()


def run_job(spark, args) -> dict:
    """The job body on a caller-owned session (tests pass their fixture)."""
    from pdf_parser_spark.config import ExtractionConfig
    from pdf_parser_spark.streaming.incremental import stream_extract
    from pdf_parser_spark.streaming.stateful_extract import \
        stream_extract_stateful

    cfg = ExtractionConfig(
        max_chars_per_chunk=args.max_chars,
        tokenizer_mode=args.tokenizer,
        overlap_chars=args.overlap_chars,
    )
    if getattr(args, "sink", "parquet") == "cow":
        import os

        from pdf_parser_spark.streaming.stateful_extract import (
            init_extracted_cow, stream_extract_stateful_to_cow)
        if not os.path.exists(os.path.join(args.output, "manifest.json")):
            init_extracted_cow(spark, args.output)
        q = stream_extract_stateful_to_cow(
            spark, args.input, args.output, args.checkpoint, cfg,
            max_files_per_trigger=args.max_files_per_trigger,
            ttl_sec=args.state_ttl,
            available_now=not args.follow,
            trigger_seconds=getattr(args, "trigger_seconds", None))
    elif args.mode == "stateful":
        q = stream_extract_stateful(
            spark, args.input, args.output, args.checkpoint, cfg,
            max_files_per_trigger=args.max_files_per_trigger,
            ttl_sec=args.state_ttl,
            available_now=not args.follow,
            trigger_seconds=getattr(args, "trigger_seconds", None),
            stall_metrics=getattr(args, "stall_metrics", False))
    else:
        q = stream_extract(
            spark, args.input, args.output, args.checkpoint, cfg,
            max_files_per_trigger=args.max_files_per_trigger,
            available_now=not args.follow,
            trigger_seconds=getattr(args, "trigger_seconds", None))
    q.awaitTermination()
    progress = q.lastProgress or {}
    out = {"mode": args.mode,
           "batches": progress.get("batchId"),
           "run_id": progress.get("runId")}
    if getattr(args, "compact_after", None):
        from pdf_parser_spark.sources.compact import compact_parquet
        out["compaction"] = compact_parquet(
            spark, f"{args.output}/extracted",
            f"{args.output}/extracted_compacted",
            target_mb=args.compact_after)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
