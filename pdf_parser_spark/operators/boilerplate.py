"""Repeated-element (header/footer) mining — the aggregation+join operator.

SURVEY.md §2.11: "blocks whose normalized text repeats across >= K turns of a
conversation (headers/footers analog) are dropped via join-back, an
aggregation + join". Here the unit is a LINE of turn text (the graft's
header/footer granularity).

Plan shape (and why it scales):
  transcripts -> explode(split(text, '\\n'))          # map-only
             -> normalize (Arrow-batched pandas UDF, the exact Python twin
                of the oracle's normalize_line — no JVM-regex dialect drift)
             -> groupBy(conv_id, norm).agg(countDistinct(turn_idx))
                                                      # partial aggregation
                                                      # map-side, then one
                                                      # shuffle on (conv,line)
             -> filter(n_turns >= K)                  # tiny survivor set
             -> groupBy(conv_id).collect_set          # reuses conv_id
                                                      # partitioning prefix
  transcripts <- left join on conv_id                 # shuffle join; with
                                                      # both sides bucketed
                                                      # by conv_id (Iceberg
                                                      # bucket(N, conv_id))
                                                      # this is co-located

The repeated-line set per conversation is tiny (headers/footers), so the
joined column adds O(few strings) per row. No driver-side collection at any
point — works at 10^12 turns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from pdf_parser_spark.config import ExtractionConfig
from pdf_parser_spark.core.heuristics import normalize_line


def _normalize_series(lines: pd.Series) -> pd.Series:
    return lines.map(lambda x: normalize_line(x) if x is not None else "")


REPEATED_COL = "__repeated_lines"

# StringType() object (not DDL string) so module import needs no session
_normalize_udf = pandas_udf(_normalize_series, StringType())


def repeated_lines_per_conversation(transcripts: DataFrame,
                                    cfg: ExtractionConfig) -> DataFrame:
    """(conv_id, __repeated_lines: array<string>) — mined headers/footers."""
    lines = (
        transcripts
        .where(F.col("text").isNotNull())
        .select("conv_id", "turn_idx",
                F.explode(F.split(F.col("text"), "\n")).alias("line"))
        .select("conv_id", "turn_idx", _normalize_udf("line").alias("norm"))
        .where(F.length("norm") >= cfg.min_repeat_line_chars)
    )
    return (
        lines
        .groupBy("conv_id", "norm")
        .agg(F.countDistinct("turn_idx").alias("n_turns"))
        .where(F.col("n_turns") >= cfg.min_repeat_turns)
        .groupBy("conv_id")
        .agg(F.collect_set("norm").alias(REPEATED_COL))
    )


def with_repeated_lines(transcripts: DataFrame,
                        cfg: ExtractionConfig) -> DataFrame:
    """Attach the mined set to every turn (left join on conv_id)."""
    if not cfg.clean_boilerplate:
        return transcripts.withColumn(
            REPEATED_COL, F.lit(None).cast("array<string>"))
    mined = repeated_lines_per_conversation(transcripts, cfg)
    return transcripts.join(mined, "conv_id", "left")
