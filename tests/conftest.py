from __future__ import annotations

import pytest
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType, TimestampType)

from pdf_parser_spark.session import build_session

TRANSCRIPT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("role", StringType()),
    StructField("text", StringType()),
    StructField("tool", StringType()),
    StructField("ts", TimestampType()),
])


@pytest.fixture(scope="session")
def spark():
    s = build_session("pdf_parser_spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_df(spark):
    from pdf_parser_spark.sources.synth import generate_transcripts

    rows = generate_transcripts(40, seed=42, max_turns=48)
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).cache()
