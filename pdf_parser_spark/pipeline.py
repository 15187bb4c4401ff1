"""End-to-end extraction pipeline + per-conversation metrics.

Graft of the reference's batch driver (reference process_gea_pdfs.py:233-298)
and its statistics wrappers (pdf_parser.py:311-347, :169-230) — minus the
sequential per-file loop and the 1-second sleeps: discovery is a table scan,
the loop is the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.config import ExtractionConfig
from pdf_parser_spark.operators.merge import extract_chunks

TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def read_transcripts(spark, path: str) -> DataFrame:
    """Scan the transcripts table.

    Parquet in this sandbox; on a production cluster this is
    ``spark.read.table("catalog.db.transcripts")`` over an Iceberg table
    partitioned by ``bucket(N, conv_id)`` so the chunk-index window and the
    boilerplate join are co-located with storage partitioning (no re-shuffle
    of raw text). Catalyst pushes column pruning + predicates into the scan.
    """
    return spark.read.parquet(path)


def extract(transcripts: DataFrame,
            cfg: ExtractionConfig = ExtractionConfig()) -> DataFrame:
    """transcripts -> extracted chunks (scale path)."""
    return extract_chunks(transcripts, cfg)


def extraction_metrics(chunks: DataFrame) -> DataFrame:
    """Per-conversation extraction metrics.

    Mirrors the reference's ``chunk_statistics``
    (reference pdf_parser.py:338-345): per-type chunk counts, total chars,
    avg chars/chunk (0 when empty — the reference's ``if chunks else 0``
    guard becomes ``coalesce``). Single partial-aggregated groupBy; at scale
    this is a map-side-combined shuffle on conv_id.
    """
    return (chunks.groupBy("conv_id").agg(
        F.count("*").alias("total_chunks"),
        F.sum(F.when(F.col("chunk_type") == "text", 1).otherwise(0)).alias("text_chunks"),
        F.sum(F.when(F.col("chunk_type") == "table", 1).otherwise(0)).alias("table_chunks"),
        F.sum(F.when(F.col("chunk_type") == "image", 1).otherwise(0)).alias("image_chunks"),
        F.sum("char_count").alias("total_chars"),
        F.coalesce(F.avg("char_count"), F.lit(0.0)).alias("avg_chars_per_chunk"),
    ))


def corpus_metrics(chunks: DataFrame) -> DataFrame:
    """Whole-run summary, mirroring generate_summary_report
    (reference process_gea_pdfs.py:169-230)."""
    return chunks.agg(
        F.countDistinct("conv_id").alias("total_conversations"),
        F.count("*").alias("total_chunks"),
        F.sum("char_count").alias("total_chars"),
        F.avg("char_count").alias("avg_chars_per_chunk"),
    )
