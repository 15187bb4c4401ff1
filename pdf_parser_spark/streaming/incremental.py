"""Structured-Streaming incremental extraction.

The reference's closest analog is incremental loading with a ``max_files``
cap (reference gea_qa_agent_optimized.py:76-163) and the batch driver's
sequential per-file loop (reference process_gea_pdfs.py:233-298). Here that
becomes idiomatic Spark:

    readStream(transcripts dir) -> foreachBatch(extract_chunks) -> append

- ``foreachBatch`` (not a streaming-native window) because chunk-index
  assignment is a window over (conv_id) — unsupported on streaming DFs and
  unnecessary: each micro-batch is a complete set of newly-landed
  conversation files, so the batch extraction pipeline runs verbatim on it.
- ``maxFilesPerTrigger`` is the reference's ``max_files`` knob.
- the checkpoint directory IS the resume state: a restart (or the next
  ``availableNow`` run) processes only files the checkpoint has not seen —
  the streaming twin of the batch lineage anti-join
  (sources/lineage.py).

Ingestion contract: a landed file contains whole conversations (the
realistic unit — a conversation is written when it ends). Conversations
split across separately-landed files would get per-batch chunk indices;
that case is the batch pipeline's job, not streaming's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdf_parser_spark.config import ExtractionConfig
from pdf_parser_spark.operators.merge import extract_chunks

TRANSCRIPT_DDL = ("conv_id string, turn_idx int, role string, "
                  "text string, tool string, ts timestamp")


def landing_reader(spark: SparkSession, input_dir: str,
                   max_files_per_trigger: int | None = None,
                   drop_null_keys: bool = False) -> DataFrame:
    """The one landing-directory readStream all three extraction streams
    share (this module's foreachBatch path reads raw — its batch pipeline
    drops null keys itself; the stateful paths filter before grouping)."""
    reader = spark.readStream.schema(TRANSCRIPT_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    df = reader.parquet(input_dir)
    if drop_null_keys:
        df = df.where("conv_id is not null and turn_idx is not null")
    return df


def start_parquet_sink(chunks: DataFrame, output_dir: str,
                       checkpoint_dir: str, available_now: bool = True,
                       trigger_seconds: int | None = None):
    """Append-mode parquet sink shared by the stateful extraction streams:
    availableNow drain (default) or an always-on processing-time trigger."""
    writer = (chunks.writeStream
              .outputMode("append")
              .format("parquet")
              .option("path", f"{output_dir}/extracted")
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def stream_extract(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str,
                   cfg: ExtractionConfig = ExtractionConfig(),
                   max_files_per_trigger: int | None = None,
                   available_now: bool = True,
                   trigger_seconds: int | None = None):
    """Start (or resume) incremental extraction over a landing directory.

    Returns the StreamingQuery; with ``available_now=True`` (default) it
    drains everything new and stops — call repeatedly to incrementally keep
    up, exactly like cron-driven ingestion. Output is an append-only
    parquet (Iceberg ``writeTo(...).append()`` on a real catalog).
    """
    # NB: the parquet file source has no mutation-tolerance option — landed
    # files MUST be immutable (the ingestion contract above already assumes
    # append-only landing; an overwritten file would be silently re-read or
    # skipped depending on timing).
    transcripts = landing_reader(spark, input_dir, max_files_per_trigger)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        (extract_chunks(batch_df, cfg)
         .write.mode("append").parquet(f"{output_dir}/extracted"))

    writer = (transcripts.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
