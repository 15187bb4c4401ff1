"""Streaming ingest NEAR-dedup: simhash suppression at arrival time.

Extends `streaming.dedupe.stream_dedup` (exact content keys) to
near-duplicates: a document arriving within ``max_hamming`` simhash bits
of anything already admitted is suppressed. The reference has no
streaming surface at all (single-process batch scripts); this is part of
the training-pipeline extension tier the task brief requires.

Architecture — foreachBatch against an ACCUMULATING SIGNATURE TABLE, not
managed state: near-dup detection needs cross-document comparison inside
blocking buckets, which `dropDuplicates`-style keyed state cannot
express, and holding every seen signature in executor state would tie
corpus-lifetime state to one query's checkpoint. The signature store is
an external table of 16-byte (id, sh) rows — resumable, queryable,
shared across queries/restarts, exactly the store the BATCH dedup tier
would build; batch and stream agree on "near-duplicate" by construction
because both run the same combination blocking
(`operators.dedup.simhash_band_buckets`) and the same popcount verify.

Idempotency: every micro-batch writes its survivors and its signatures
under ``batch=<id>`` subdirectories with overwrite — a re-run of a
failed batch replaces its own output instead of appending twice (on a
lakehouse this is one MERGE transaction; partition-overwrite is the
plain-parquet rendition).

Per-batch decision rule (deterministic):
1. rows within ``max_hamming`` of a STORED signature are suppressed;
2. surviving rows are near-deduped among themselves (connected
   components over simhash pairs, min-id survivor per cluster);
3. survivors' signatures are committed to the store.
A doc near a suppressed-but-not-stored doc therefore survives (greedy
first-arrival semantics, matching stream_dedup's horizon rule but with
an unbounded, externalized horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SIG_SCHEMA = "id string, sh long"


def read_signature_store(spark: SparkSession, store_path: str,
                         exclude_batch: int | None = None) -> DataFrame:
    """The accumulated (id, sh) signature table; empty on first batch.

    ``exclude_batch`` drops that ``batch=<id>`` partition from the read —
    REQUIRED when processing batch ``<id>`` itself: a foreachBatch replay
    after a pre-checkpoint crash would otherwise read the batch's own
    committed signatures, self-suppress every previously admitted row,
    and overwrite the batch's output with EMPTY data (permanent loss).

    Only a missing store path is swallowed (first batch); any other read
    failure raises — silently returning an empty store would disable
    near-dedup for the batch and admit duplicates permanently."""
    try:
        store = spark.read.parquet(store_path)
    except Exception as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], SIG_SCHEMA)
        raise
    if exclude_batch is not None and "batch" in store.columns:
        store = store.where(F.col("batch") != exclude_batch)
    return store.select("id", "sh")


def near_dedup_batch(batch: DataFrame, store: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     max_hamming: int = 3,
                     n_blocks: int | None = None) -> tuple[DataFrame,
                                                           DataFrame]:
    """One micro-batch through the decision rule above.

    Returns ``(survivors, new_signatures)``: the batch rows to admit
    (original schema) and their (id, sh) signatures to commit. Pure
    batch DataFrame logic — unit-testable without a streaming query, and
    the exact function the foreachBatch wrapper runs.
    """
    from pdf_parser_spark.operators.dedup import (dedup_by_components,
                                                  release_owned_storage,
                                                  simhash_band_buckets,
                                                  simhash_pairs_from_hashes,
                                                  simhash_udf)

    sh = batch.select(F.col(id_col).alias("id"),
                      simhash_udf(F.col(text_col)).alias("sh"))
    sh = sh.localCheckpoint(eager=True)  # one UDF pass; several consumers

    # 1. suppress anything near a STORED signature: blocking join on the
    # shared band buckets, exact popcount verify
    n_blocks_eff = n_blocks or (max_hamming + 1)
    bb = simhash_band_buckets(sh, max_hamming, n_blocks=n_blocks_eff)
    sb = simhash_band_buckets(store, max_hamming, n_blocks=n_blocks_eff) \
        .withColumnRenamed("id", "sid").withColumnRenamed("sh", "ssh")
    from pdf_parser_spark.operators.dedup import hamming_distance
    hit = (bb.join(sb, ["band", "key"])
           .where(hamming_distance(F.col("sh"), F.col("ssh"))
                  <= max_hamming)
           .select("id").distinct())
    fresh = sh.join(hit, "id", "left_anti")

    # 2. near-dedup the fresh rows among themselves (min-id survivor per
    # connected near-dup cluster — same rule as the batch tier)
    pairs = simhash_pairs_from_hashes(fresh, max_hamming,
                                      n_blocks=n_blocks_eff)
    survivors_sh = dedup_by_components(fresh, pairs, "id")
    sig = survivors_sh.localCheckpoint(eager=True)
    release_owned_storage(survivors_sh)

    survivors = batch.join(sig.select(F.col("id").alias(id_col)), id_col)
    return survivors, sig


def stream_near_dedup(docs: DataFrame, output_path: str, store_path: str,
                      checkpoint_path: str, id_col: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 3,
                      n_blocks: int | None = None):
    """Wire a streaming document source through near-dedup-on-ingest.

    Returns a configured DataStreamWriter — call ``.trigger(...)`` /
    ``.start()`` on it. Survivors land under ``output_path/batch=<id>/``,
    signatures accumulate under ``store_path/batch=<id>/`` (both
    idempotent per batch: a replay excludes its own prior partition from
    the store read and overwrites exactly its own output)."""
    def _process(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        store = read_signature_store(spark, store_path,
                                     exclude_batch=batch_id)
        survivors, sig = near_dedup_batch(
            bdf, store, id_col=id_col, text_col=text_col,
            max_hamming=max_hamming, n_blocks=n_blocks)
        (survivors.write.mode("overwrite")
         .parquet(f"{output_path}/batch={batch_id}"))
        (sig.write.mode("overwrite")
         .parquet(f"{store_path}/batch={batch_id}"))

    return (docs.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_path))
