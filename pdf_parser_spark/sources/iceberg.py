"""Iceberg table integration (capability-gated).

The north rule targets Iceberg tables: transcripts in, extracted /
metrics / lineage out, all partitioned by ``bucket(N, conv_id)`` so that

- the extraction scan is split-pruned per bucket (resume filter = partition
  pruning, `sources/lineage.py`),
- the bucketed zero-shuffle path (`operators/merge.extract_chunks_bucketed`)
  gets conversation-complete splits directly from the table layout,
- commits are atomic snapshot operations (`replace-partition`), making the
  per-bucket jobs idempotent without dynamic-overwrite tricks.

This sandbox ships no Iceberg runtime jar, so everything here degrades
cleanly: ``iceberg_available()`` is False, the pipeline runs on parquet
with `partitionBy(bucket_id)` + dynamic overwrite (`sources/lineage.py`),
and the DDL/writeTo wrappers below are the production wiring a real
deployment turns on with one ``spark.jars.packages`` +
``spark.sql.catalog.<name>`` pair of configs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TRANSCRIPTS_DDL = """
CREATE TABLE IF NOT EXISTS {table} (
  conv_id  STRING,
  turn_idx INT,
  role     STRING,
  text     STRING,
  tool     STRING,
  ts       TIMESTAMP
) USING iceberg
PARTITIONED BY (bucket({n_buckets}, conv_id))
TBLPROPERTIES (
  'write.distribution-mode' = 'hash',
  'write.parquet.compression-codec' = 'zstd',
  'sort-order' = 'conv_id ASC, turn_idx ASC'
)
"""

EXTRACTED_DDL = """
CREATE TABLE IF NOT EXISTS {table} (
  conv_id       STRING,
  chunk_idx     BIGINT,
  turn_idx      INT,
  chunk_type    STRING,
  text          STRING,
  char_count    BIGINT,
  block_count   INT,
  block_indices ARRAY<BIGINT>,
  table_index   INT,
  image_index   INT,
  table_cells   ARRAY<ARRAY<STRING>>
) USING iceberg
PARTITIONED BY (bucket({n_buckets}, conv_id))
"""

METRICS_DDL = """
CREATE TABLE IF NOT EXISTS {table} (
  conv_id             STRING,
  total_chunks        BIGINT,
  text_chunks         BIGINT,
  table_chunks        BIGINT,
  image_chunks        BIGINT,
  total_chars         BIGINT,
  avg_chars_per_chunk DOUBLE
) USING iceberg
PARTITIONED BY (bucket({n_buckets}, conv_id))
"""

LINEAGE_DDL = """
CREATE TABLE IF NOT EXISTS {table} (
  bucket_id   INT,
  status      STRING,
  n_convs     BIGINT,
  n_chunks    BIGINT,
  n_chars     BIGINT,
  wall_sec    DOUBLE,
  finished_ts TIMESTAMP
) USING iceberg
"""


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog class is loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def create_tables(spark: SparkSession, catalog_db: str,
                  n_buckets: int = 4096) -> dict[str, str]:
    """Create the four tables under ``catalog.db``; returns their names."""
    names = {kind: f"{catalog_db}.{kind}"
             for kind in ("transcripts", "extracted", "metrics", "lineage")}
    spark.sql(TRANSCRIPTS_DDL.format(table=names["transcripts"],
                                     n_buckets=n_buckets))
    spark.sql(EXTRACTED_DDL.format(table=names["extracted"],
                                   n_buckets=n_buckets))
    spark.sql(METRICS_DDL.format(table=names["metrics"], n_buckets=n_buckets))
    spark.sql(LINEAGE_DDL.format(table=names["lineage"]))
    return names


def append(df: DataFrame, table: str) -> None:
    """Atomic snapshot append."""
    df.writeTo(table).append()


def replace_buckets(df: DataFrame, table: str) -> None:
    """Idempotent per-bucket commit: atomically replace exactly the
    partitions present in ``df`` (the Iceberg-native version of the parquet
    dynamic-overwrite in sources/lineage.py)."""
    df.writeTo(table).overwritePartitions()
