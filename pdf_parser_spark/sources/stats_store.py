"""Incrementally-maintained corpus token statistics.

Corpus-level statistics (the unigram LM behind the CCNet quality band,
DSIR's bucket counts, vocabulary size) are full-scan aggregations; at
10^12 turns, recomputing them for every new ingest batch re-reads the
whole corpus. This module maintains a (term, c) count table that is
merged INCREMENTALLY: each batch contributes a map-side-combined delta,
and the merge cost is O(vocabulary + delta) — never O(corpus).

Durability is MVCC-versioned, the Iceberg snapshot shape rebuilt on
plain parquet (same spirit as ``sources/lineage.py``'s dynamic-overwrite
twin): version K lives under ``store/v=K/`` (hash-bucketed by term so a
merge shuffles once on fixed-width keys), and a tiny ``manifest.json``
records the current version plus every applied batch id. A merge writes
version K+1 from (K + delta) and commits by rewriting the manifest LAST,
so a crash mid-write leaves K intact and readers never see a torn
version; re-applying an already-recorded batch id is a no-op — the
exactly-once property the streaming path (foreachBatch) relies on. On
real Iceberg, data + ledger are one atomic snapshot commit; the manifest
twin documents the same contract with the same recovery story.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parser_spark.operators.textstats import tokens_array

_MANIFEST = "manifest.json"


def token_count_deltas(docs: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """(term, c) for one batch — one explode collapsed immediately by a
    map-side-combined groupBy; the only corpus-sized stream is reduced
    before any shuffle."""
    return (docs.select(F.explode(tokens_array(F.col(text_col)))
                        .alias("term"))
            .groupBy("term").agg(F.count("*").alias("c")))


def _read_manifest(store_path: str) -> dict:
    p = os.path.join(store_path, _MANIFEST)
    if not os.path.exists(p):
        return {"version": 0, "applied": []}
    with open(p) as fh:
        return json.load(fh)


def read_token_counts(spark: SparkSession, store_path: str,
                      version: int | None = None) -> DataFrame:
    """(term, c) snapshot — the current version by default, or any
    retained older ``version`` (time travel, the Iceberg snapshot-read
    analog: every committed version stays on disk until a caller
    vacuums, so yesterday's LM is reproducible for audits and A/Bs).
    Version 0 is the empty store."""
    m = _read_manifest(store_path)
    v = m["version"] if version is None else version
    if v == 0:
        return spark.createDataFrame([], "term string, c long")
    if not 0 < v <= m["version"]:
        raise ValueError(f"version {v} not in store (current: "
                         f"{m['version']})")
    return (spark.read.parquet(os.path.join(store_path, f"v={v}"))
            .select("term", "c"))


def merge_token_counts(spark: SparkSession, docs: DataFrame,
                       store_path: str, batch_id: int,
                       text_col: str = "text",
                       n_buckets: int = 64) -> dict:
    """Merge one batch's token counts into the store, exactly once.

    Returns the manifest after the call. A ``batch_id`` already in the
    manifest's ledger is skipped (idempotent — foreachBatch retries and
    restarts re-deliver batches). The new version is written FULLY
    before the manifest flips, so readers see the old snapshot until the
    commit point and a crash leaves the store at the old version with
    the batch unrecorded — the retry then redoes the merge from intact
    inputs.
    """
    m = _read_manifest(store_path)
    if batch_id in m["applied"]:
        return m
    delta = token_count_deltas(docs, text_col)
    merged = (read_token_counts(spark, store_path)
              .unionByName(delta)
              .groupBy("term").agg(F.sum("c").alias("c"))
              .withColumn("bucket",
                          F.pmod(F.xxhash64("term"), F.lit(n_buckets))
                           .cast("int")))
    new_version = m["version"] + 1
    (merged.repartition(n_buckets, "bucket")
     .write.mode("overwrite")
     .parquet(os.path.join(store_path, f"v={new_version}")))
    m = {"version": new_version, "applied": m["applied"] + [batch_id]}
    tmp = os.path.join(store_path, _MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(m, fh)
    os.replace(tmp, os.path.join(store_path, _MANIFEST))
    return m


def stream_token_stats(docs: DataFrame, store_path: str,
                       checkpoint: str, text_col: str = "text"):
    """Maintain the store from a document stream: one merge per
    micro-batch, exactly-once via the batch-id ledger (foreachBatch
    re-delivers on restart; the ledger absorbs the replay)."""
    os.makedirs(store_path, exist_ok=True)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_token_counts(batch_df.sparkSession, batch_df, store_path,
                           batch_id, text_col)

    return (docs.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def bucket_counts_from_store(counts: DataFrame,
                             n_buckets: int = 4096) -> DataFrame:
    """Derive DSIR's hashed-bucket counts (b, c) from the store's
    (term, c) snapshot — O(vocabulary), no corpus scan. Uses the same
    hashed_token_bucket the scorer uses, so the bucket LM is identical
    to one computed from the raw token stream."""
    from pdf_parser_spark.operators.curation import hashed_token_bucket

    return (counts.select(hashed_token_bucket(F.col("term"), n_buckets)
                          .alias("b"), "c")
            .groupBy("b").agg(F.sum("c").alias("c")))
