"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the extraction core run over the sf0.001
``documents`` table adapted as single-turn-per-doc transcripts.

``queries()`` / ``oracle_sql()`` — the operator surface from SURVEY.md §2
plus the training-pipeline extensions (dedup, similarity search, text
stats), implemented in ``pdf_parser_spark.queries``. Every SQL-expressible
operator carries a DuckDB oracle; the synthesized-transcript extraction
entries are rows-only (their correctness gate is the pytest oracle-equality
suite in tests/test_spark_equality.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_parser_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["extract_documents"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
