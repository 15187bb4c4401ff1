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


def extract_with_embeddings(transcripts: DataFrame,
                            cfg: ExtractionConfig = ExtractionConfig(),
                            dim: int = 64) -> tuple[DataFrame, DataFrame]:
    """The reference's full per-document flow (process_pdf_with_embeddings,
    reference pdf_parser.py:350-440) as one composition: extract ->
    embed every chunk (iterator pandas UDF) -> per-conversation metrics.
    Returns (embedded_chunks, metrics). The reference's embedding
    success/failure accounting (pdf_parser.py:411-419) degenerates here:
    the stub encoder cannot fail, so metrics carry chunk/char counts and
    the per-chunk token_count column carries the reference's
    token_count=len(text) bookkeeping."""
    from pdf_parser_spark.operators.embedding import embed_chunks

    chunks = extract_chunks(transcripts, cfg)
    embedded = embed_chunks(chunks, dim=dim)
    return embedded, full_metrics(transcripts, chunks, cfg)


def cleaning_metrics(transcripts: DataFrame,
                     cfg: ExtractionConfig = ExtractionConfig()) -> DataFrame:
    """Per-conversation tokenizer/cleaning metrics: blocks kept, lines
    dropped (north rule: "extraction metrics (blocks kept/dropped, chunk
    counts)").

    One map-only pandas pass over turn text/tool + a partial-aggregated
    groupBy(conv_id) — never touches the merge. ``lines_dropped`` counts
    boilerplate-stripped lines (repeated header/footer, link-heavy,
    low-density); in parity mode (clean_boilerplate=False) it is 0 by
    construction.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (IntegerType, StringType, StructField,
                                   StructType)

    from pdf_parser_spark.core.blocks import tokenize_turn
    from pdf_parser_spark.core.heuristics import is_boilerplate_line
    from pdf_parser_spark.operators.boilerplate import (REPEATED_COL,
                                                        with_repeated_lines)
    from pdf_parser_spark.operators.merge import _as_repeated

    schema = StructType([
        StructField("conv_id", StringType()),
        StructField("n_blocks", IntegerType()),
        StructField("n_lines", IntegerType()),
        StructField("n_lines_dropped", IntegerType()),
    ])

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for conv_id, turn_idx, text, tool, rep in zip(
                    pdf["conv_id"].tolist(), pdf["turn_idx"].tolist(),
                    pdf["text"].tolist(), pdf["tool"].tolist(),
                    pdf[REPEATED_COL].tolist()):
                repeated = _as_repeated(rep)
                blocks = tokenize_turn(int(turn_idx), text, tool, cfg,
                                       repeated)
                lines = text.split("\n") if text else []
                dropped = (sum(1 for ln in lines
                               if is_boilerplate_line(ln, cfg, repeated))
                           if cfg.clean_boilerplate else 0)
                out.append((conv_id, len(blocks), len(lines), dropped))
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    src = with_repeated_lines(transcripts, cfg)
    per_turn = src.select("conv_id", "turn_idx", "text", "tool",
                          REPEATED_COL).mapInPandas(stats, schema)
    return per_turn.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum("n_blocks").alias("blocks_kept"),
        F.sum("n_lines").alias("lines_total"),
        F.sum("n_lines_dropped").alias("lines_dropped"))


def full_metrics(transcripts: DataFrame, chunks: DataFrame,
                 cfg: ExtractionConfig = ExtractionConfig()) -> DataFrame:
    """The complete metrics table: chunk stats + blocks kept / lines
    dropped, one row per conversation."""
    return extraction_metrics(chunks).join(
        cleaning_metrics(transcripts, cfg), "conv_id", "full")


def corpus_metrics(chunks: DataFrame) -> DataFrame:
    """Whole-run summary, mirroring generate_summary_report
    (reference process_gea_pdfs.py:169-230)."""
    return chunks.agg(
        F.countDistinct("conv_id").alias("total_conversations"),
        F.count("*").alias("total_chunks"),
        F.sum("char_count").alias("total_chars"),
        F.avg("char_count").alias("avg_chars_per_chunk"),
    )
