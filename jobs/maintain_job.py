"""spark-submit entry point for incremental extracted-table maintenance.

Cluster usage (same packaging contract as jobs/extract_job.py)::

    python jobs/package.py                      # builds dist/pdf_parser_spark.zip
    spark-submit --py-files dist/pdf_parser_spark.zip \
        jobs/maintain_job.py \
        --src  /lake/transcripts_cow \
        --dst  /lake/extracted_cow \
        [--build]            # first run: full extraction into dst
        [--compact-above N]  # fold dst when its file count exceeds N
        [--clean-boilerplate] [--tokenizer paragraphs] ...

Run it after each CDC commit (or on a schedule): it reads the source cow
table's changelog from the last reflected version, re-extracts only the
changed conversations, and merges the chunks in — exactly-once under
re-runs (the merge is ledgered under the source version it reflects).
A run with nothing new to reflect prints ``{"skipped": true}`` and does
no data work. The extraction flags shape --build only: refreshes always
replay the config recorded in the target manifest (one table, one
config — by contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser(
        description="incremental transcripts-CDC -> extracted-chunks merge")
    ap.add_argument("--src", required=True,
                    help="transcripts cow table dir (sources/cowtable.py)")
    ap.add_argument("--dst", required=True,
                    help="extracted-chunks cow table dir")
    ap.add_argument("--build", action="store_true",
                    help="create dst with a full extraction first")
    ap.add_argument("--n-files", type=int, default=8,
                    help="initial dst file count for --build")
    ap.add_argument("--compact-above", type=int, default=None,
                    help="compact dst after refresh when its current "
                         "snapshot exceeds this many files")
    ap.add_argument("--target-mb", type=int, default=128)
    ap.add_argument("--clean-boilerplate", action="store_true")
    ap.add_argument("--tokenizer", default="turn",
                    choices=["turn", "paragraphs"])
    ap.add_argument("--max-chars", type=int, default=800)
    ap.add_argument("--overlap-chars", type=int, default=0)
    ap.add_argument("--merge-strategy", choices=("cow", "mor"),
                    default="cow",
                    help="refresh merge mode: mor = merge-on-read "
                         "(O(batch) commits, masks applied at read; "
                         "pair with --compact-above or --rewrite-masks "
                         "to reconcile)")
    ap.add_argument("--rewrite-masks", action="store_true",
                    help="after the refresh, rewrite only the dst files"
                         " holding equality-delete masks (targeted "
                         "merge-on-read reconciliation)")
    ap.add_argument("--embed-dst", default=None,
                    help="also maintain a derived embeddings table here"
                         " (build or refresh follows the chunk table)")
    ap.add_argument("--embed-store", default=None,
                    help="content-addressed vector cache dir (required "
                         "with --embed-dst)")
    ap.add_argument("--embed-dim", type=int, default=32)
    ap.add_argument("--ivf-dst", default=None,
                    help="also maintain a derived IVF index table here "
                         "(follows the embeddings table's changelog; "
                         "requires --embed-dst)")
    ap.add_argument("--ivf-cells", type=int, default=16)
    ap.add_argument("--ivf-pq-m", type=int, default=None,
                    help="store residual PQ codes too (maintained "
                         "IVFADC: ADC probes scan 4+m bytes/row)")
    ap.add_argument("--dedup-dst", default=None,
                    help="also maintain a MinHash-LSH near-dup index "
                         "table here (follows the chunk table's "
                         "changelog; probe it at ingest with "
                         "dedup_index.dup_check_batch)")
    ap.add_argument("--dedup-bands", type=int, default=4)
    ap.add_argument("--dedup-hashes", type=int, default=8)
    ap.add_argument("--metrics-dst", default=None,
                    help="also maintain a per-conversation extraction-"
                         "metrics table here (incremental view "
                         "maintenance: only changed conversations "
                         "re-aggregate)")
    ap.add_argument("--wap", action="store_true",
                    help="write-audit-publish refresh: stage the chunk "
                         "merge on a branch, audit the changed "
                         "conversations (dup keys / NULL text / bad "
                         "char_count), publish main only on green; a "
                         "red audit drops the branch, leaves every "
                         "maintained table untouched, and exits 3")
    ap.add_argument("--wap-min-chunk-ratio", type=float, default=None,
                    help="with --wap: fail the audit when the staged "
                         "chunk count for the changed conversations "
                         "drops below this fraction of their current "
                         "count (collapse guard)")
    ap.add_argument("--tag", default=None,
                    help="after a successful run, move this tag to each"
                         " maintained table's current version (promote-"
                         "on-green; reads via read_table(version=TAG) "
                         "then follow it, and vacuum keeps it)")
    ap.add_argument("--orphan-sweep-s", type=float, default=None,
                    help="after the run, remove_orphan_files(dst) with "
                         "this mtime grace window in seconds")
    ap.add_argument("--wap-dup-gate-bands", type=int, default=None,
                    help="with --wap and --dedup-dst: quarantine the "
                         "refresh when a staged chunk shares >= this "
                         "many LSH bands with another conversation's "
                         "already-indexed chunk (near_dup_audit)")
    ap.add_argument("--fsck", choices=("structural", "data"),
                    default=None,
                    help="after the run, fsck_table every maintained "
                         "table ('data' adds head-invariant re-proof); "
                         "exit 4 if any table fails")
    ap.add_argument("--fsck-lineage", type=int, default=None,
                    metavar="SAMPLE_CONVS",
                    help="after the run, fsck_lineage re-derives this "
                         "many hash-sampled conversations per hop and "
                         "digest-compares against the stored rows; "
                         "exit 4 on mismatch")
    args = ap.parse_args(argv)
    if args.ivf_dst and not args.embed_dst:
        ap.error("--ivf-dst requires --embed-dst")
    if bool(args.embed_dst) != bool(args.embed_store):
        ap.error("--embed-dst and --embed-store go together")
    if args.wap_dup_gate_bands is not None and not (args.wap
                                                    and args.dedup_dst):
        ap.error("--wap-dup-gate-bands requires --wap and --dedup-dst")

    # imports AFTER arg parsing so --help works without the zip on sys.path
    from pyspark.sql import SparkSession

    from pdf_parser_spark.config import ExtractionConfig
    from pdf_parser_spark.sources.cowtable import (compact_table,
                                                   create_tag,
                                                   read_manifest,
                                                   remove_orphan_files,
                                                   rewrite_masked_files)
    from pdf_parser_spark.sources.maintain import (build_embedded_table,
                                                   build_extracted_table,
                                                   build_ivf_table,
                                                   build_metrics_table,
                                                   refresh_embedded_table,
                                                   refresh_extracted_table,
                                                   refresh_ivf_table,
                                                   refresh_metrics_table,
                                                   wap_refresh_extracted)

    spark = SparkSession.builder.appName("pdf_parser_spark-maintain") \
        .getOrCreate()
    try:
        out: dict = {}
        if args.build:
            cfg = ExtractionConfig(
                max_chars_per_chunk=args.max_chars,
                tokenizer_mode=args.tokenizer,
                clean_boilerplate=args.clean_boilerplate,
                overlap_chars=args.overlap_chars,
            )
            out["build"] = build_extracted_table(
                spark, args.src, args.dst, cfg, n_files=args.n_files)
        else:
            # refresh always uses the config RECORDED at build time —
            # mixing configs in one table breaks the digest-equal-to-
            # rebuild contract, so the flags only shape --build
            if args.wap:
                audits = None
                if args.wap_dup_gate_bands is not None:
                    from pdf_parser_spark.sources.dedup_index import (
                        near_dup_audit)
                    audits = {"near_dup": near_dup_audit(
                        spark, args.dedup_dst,
                        min_bands=args.wap_dup_gate_bands)}
                out["refresh"] = wap_refresh_extracted(
                    spark, args.src, args.dst,
                    strategy=args.merge_strategy,
                    audits=audits,
                    min_chunk_ratio=args.wap_min_chunk_ratio)
            else:
                out["refresh"] = refresh_extracted_table(
                    spark, args.src, args.dst,
                    strategy=args.merge_strategy)
            if args.wap and "audits" in out["refresh"] \
                    and not out["refresh"]["published"]:
                # red audit: dst never moved, so the derived tables
                # below would no-op; make the failure loud instead
                print(json.dumps(out))
                sys.exit(3)
        if args.embed_dst:
            if args.build or not os.path.exists(
                    os.path.join(args.embed_dst, "manifest.json")):
                out["embed"] = build_embedded_table(
                    spark, args.dst, args.embed_dst, args.embed_store,
                    dim=args.embed_dim)
            else:
                out["embed"] = refresh_embedded_table(
                    spark, args.dst, args.embed_dst, args.embed_store,
                    strategy=args.merge_strategy)
        if args.ivf_dst:
            # symmetric with the embed branch: --build against an
            # existing ivf dir must fail loudly inside create_table,
            # never silently keep a stale index from an old lineage
            if args.build or not os.path.exists(
                    os.path.join(args.ivf_dst, "manifest.json")):
                out["ivf"] = build_ivf_table(
                    spark, args.embed_dst, args.ivf_dst,
                    n_cells=args.ivf_cells, pq_m=args.ivf_pq_m)
            else:
                out["ivf"] = refresh_ivf_table(
                    spark, args.embed_dst, args.ivf_dst,
                    strategy=args.merge_strategy)
        if args.dedup_dst:
            from pdf_parser_spark.sources.dedup_index import (
                build_dedup_index, refresh_dedup_index)
            if args.build or not os.path.exists(
                    os.path.join(args.dedup_dst, "manifest.json")):
                out["dedup_index"] = build_dedup_index(
                    spark, args.dst, args.dedup_dst,
                    num_hashes=args.dedup_hashes,
                    bands=args.dedup_bands)
            else:
                out["dedup_index"] = refresh_dedup_index(
                    spark, args.dst, args.dedup_dst,
                    strategy=args.merge_strategy)
        if args.metrics_dst:
            if args.build or not os.path.exists(
                    os.path.join(args.metrics_dst, "manifest.json")):
                out["metrics"] = build_metrics_table(
                    spark, args.dst, args.metrics_dst)
            else:
                out["metrics"] = refresh_metrics_table(
                    spark, args.dst, args.metrics_dst,
                    strategy=args.merge_strategy)
        if args.rewrite_masks:
            out["rewrite"] = rewrite_masked_files(spark, args.dst)
        if args.compact_above is not None:
            m = read_manifest(args.dst)
            n = len(m["snapshots"][str(m["version"])]["files"])
            if n > args.compact_above:
                out["compaction"] = compact_table(
                    spark, args.dst, target_mb=args.target_mb)
        if args.tag:
            maintained = [d for d in (args.dst, args.embed_dst,
                                      args.ivf_dst, args.metrics_dst,
                                      args.dedup_dst)
                          if d and os.path.exists(
                              os.path.join(d, "manifest.json"))]
            out["tag"] = {d: create_tag(d, args.tag)
                          for d in maintained}
        if args.orphan_sweep_s is not None:
            # every table this job maintains accumulates orphans (the
            # embed store's base_version guard deliberately strands a
            # losing writer's files) — sweep them all
            dirs = [d for d in (args.dst, args.embed_dst,
                                args.embed_store, args.ivf_dst,
                                args.metrics_dst, args.dedup_dst)
                    if d and os.path.exists(
                        os.path.join(d, "manifest.json"))]
            out["orphan_sweep"] = {
                d: remove_orphan_files(
                    d, older_than_s=args.orphan_sweep_s)
                for d in dirs}
        if args.fsck:
            from pdf_parser_spark.sources.fsck import fsck_table
            dirs = [d for d in (args.dst, args.embed_dst, args.ivf_dst,
                                args.metrics_dst, args.dedup_dst)
                    if d and os.path.exists(
                        os.path.join(d, "manifest.json"))]
            out["fsck"] = {d: fsck_table(spark, d,
                                         data_checks=args.fsck == "data")
                           for d in dirs}
            if not all(r["ok"] for r in out["fsck"].values()):
                print(json.dumps(out))
                sys.exit(4)
        if args.fsck_lineage:
            from pdf_parser_spark.sources.fsck import fsck_lineage
            out["fsck_lineage"] = fsck_lineage(
                spark, args.src, args.dst,
                emb_dir=args.embed_dst, idx_dir=args.dedup_dst,
                metrics_dir=args.metrics_dst,
                sample_convs=args.fsck_lineage)
            if not out["fsck_lineage"]["ok"]:
                print(json.dumps(out))
                sys.exit(4)
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
