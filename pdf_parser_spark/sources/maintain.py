"""Incremental maintenance of the extracted-chunks table from source CDC.

The 10^12-turn regime's must-have: when a CDC batch lands on the
transcripts table, DO NOT re-extract the world — re-extract exactly the
conversations whose turns changed and merge the result into the
extracted table. Extraction is a pure per-conversation function (chunk
merge windows and boilerplate mining both group by conv_id —
core/merge.py, operators/boilerplate.py), so per-conversation
recomputation is EQUAL to a full rebuild, which the tests pin by
digest.

Plan shape per refresh:
  table_changes(src, last_seen, now)       # reads only files the two
                                           # manifests do not share
  -> distinct conv_id                      # CDC-sized (driver-safe)
  -> re-extract those conversations        # source scan pruned to them
  -> MERGE into the extracted cow table:   # file-pruned by chunk key
       upsert every recomputed chunk,
       delete stale chunk keys (a conversation that shrank or vanished)

Exactly-once: the merge is ledgered under the source version it
reflects, and the reflected version is recorded in the target manifest
AFTER the merge commits — a crash between the two replays into a
ledger no-op, then records. Both tables stay time-travelable.

Reference analog: none — the reference re-parses a PDF when asked
(pdf_parser.py is stateless per call); this is the incremental-view
half that makes the extraction pipeline operable as data keeps
arriving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parser_spark.config import ExtractionConfig
from pdf_parser_spark.pipeline import extract
from pdf_parser_spark.sources.cowtable import (_commit, create_table,
                                               merge_into, read_manifest,
                                               read_table, table_changes)

CHUNK_KEY = "chunk_key"

# above this many changed conversations, filter by join instead of an
# inlined isin literal (a multi-thousand-value In expression bloats the
# plan; the join side is still broadcast-sized)
_ISIN_MAX = 1000


def _with_chunk_key(chunks: DataFrame) -> DataFrame:
    """conv_id#chunk_idx — one string key per chunk row, contiguous per
    conversation so re-extraction touches contiguous key ranges and the
    merge's footer-stats pruning bites."""
    return chunks.withColumn(
        CHUNK_KEY, F.concat_ws("#", F.col("conv_id"),
                               F.format_string("%06d", F.col("chunk_idx"))))


def _only_convs(df: DataFrame, convs_df: DataFrame,
                convs: list[str]) -> DataFrame:
    if len(convs) <= _ISIN_MAX:
        return df.where(F.col("conv_id").isin(convs))
    return df.join(F.broadcast(convs_df), "conv_id", "left_semi")


def _pruned_conv_read(spark: SparkSession, table_dir: str,
                      convs: list[str], convs_df: DataFrame) -> DataFrame:
    """Current snapshot restricted to ``convs`` — but opening ONLY files
    whose footer key range intersects some conversation's key-prefix
    range (keys are ``conv_id#...``, so a conversation is the range
    [conv#, conv#\\uffff]). One distributed footer-metadata job, then a
    scan of O(changed) files instead of O(table); the residual filter
    drops range false positives."""
    import bisect
    import os

    from pdf_parser_spark.sources.cowtable import file_key_bounds

    m = read_manifest(table_dir)
    files = m["snapshots"][str(m["version"])]["files"]
    if not files:
        return _only_convs(read_table(spark, table_dir), convs_df, convs)
    key_col = m["key_col"]
    bounds = file_key_bounds(spark, table_dir, files, key_col, manifest=m)
    starts = sorted(c + "#" for c in convs)
    hit = []
    for b in bounds:
        if b["kmin"] is None:       # no stats — must read
            hit.append(b["file"])
            continue
        # a conversation range [s, s+￿] intersects [kmin, kmax]
        # iff some s <= kmax AND its range end >= kmin, i.e. there is a
        # start s with prefix-of-kmin-or-later position: check the
        # nearest start at/below kmax and the one covering kmin
        i = bisect.bisect_right(starts, b["kmax"])
        if i == 0:
            continue
        s = starts[i - 1]
        if s + "￿" >= b["kmin"]:
            hit.append(b["file"])
    if not hit:
        return read_table(spark, table_dir).limit(0)
    from pdf_parser_spark.sources.cowtable import _read_files
    df = _read_files(spark, m, table_dir, sorted(hit))
    return _only_convs(df, convs_df, convs)


def _record_src_version(dst_dir: str, src_version: int) -> None:
    m = read_manifest(dst_dir)
    m["src_version"] = src_version
    _commit(dst_dir, m)


def build_extracted_table(spark: SparkSession, src_dir: str, dst_dir: str,
                          cfg: ExtractionConfig = ExtractionConfig(),
                          *, n_files: int = 8) -> dict:
    """Initial full extraction of the transcripts cow table at ``src_dir``
    into a chunk-keyed cow table at ``dst_dir`` (range-laid-out on the
    chunk key so later refreshes prune), recording which source version
    it reflects."""
    src_v = read_manifest(src_dir)["version"]
    chunks = _with_chunk_key(extract(read_table(spark, src_dir), cfg))
    create_table(spark,
                 chunks.repartitionByRange(n_files, CHUNK_KEY),
                 dst_dir, CHUNK_KEY)
    _record_src_version(dst_dir, src_v)
    return {"src_version": src_v, "created": True}


def refresh_extracted_table(spark: SparkSession, src_dir: str,
                            dst_dir: str,
                            cfg: ExtractionConfig = ExtractionConfig()
                            ) -> dict:
    """Advance ``dst_dir`` to reflect ``src_dir``'s current version by
    re-extracting ONLY conversations the changelog names. Returns the
    refresh stats (changed conversations, merge stats, versions)."""
    src_v = read_manifest(src_dir)["version"]
    dst_m = read_manifest(dst_dir)
    from_v = dst_m.get("src_version")
    if from_v is None:
        raise ValueError(f"{dst_dir} records no src_version — build it "
                         "with build_extracted_table first")
    if from_v >= src_v:
        return {"skipped": True, "src_version": src_v}

    changed = (table_changes(spark, src_dir, from_v, src_v)
               .select("conv_id").distinct())
    convs = sorted(r[0] for r in changed.collect())
    if not convs:  # e.g. the only steps were compactions
        _record_src_version(dst_dir, src_v)
        return {"skipped": True, "src_version": src_v,
                "changed_convs": 0}

    src_rows = _pruned_conv_read(spark, src_dir, convs, changed)
    new_chunks = _with_chunk_key(extract(src_rows, cfg))
    old_chunks = _pruned_conv_read(spark, dst_dir, convs, changed)
    stale = old_chunks.join(new_chunks.select(CHUNK_KEY),
                            CHUNK_KEY, "left_anti")
    batch = (new_chunks.withColumn("op", F.lit("upsert"))
             .unionByName(stale.withColumn("op", F.lit("delete"))))
    stats = merge_into(spark, dst_dir, batch, batch_id=src_v)
    _record_src_version(dst_dir, src_v)
    return {"src_version": src_v, "from_version": from_v,
            "changed_convs": len(convs), "merge": stats}
