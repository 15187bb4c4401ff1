"""Small-file compaction: rows preserved exactly, file count sized from
measured bytes, z-order variant clusters while compacting."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.sources.compact import (compact_parquet, dir_stats,
                                              plan_n_files)


def _digest(df):
    canon = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"),
                                                   F.lit("\x00"))
                                        for c in sorted(df.columns)]))
    h = F.conv(F.substring(canon, 1, 15), 16, 10).cast("decimal(38,0)")
    r = df.agg(F.sum(h).alias("s"), F.count("*").alias("n")).collect()[0]
    return int(r.s), int(r.n)


def test_plan_n_files_math():
    mb = 1024 * 1024
    assert plan_n_files(0, 128) == 1
    assert plan_n_files(1, 128) == 1
    assert plan_n_files(128 * mb, 128) == 1
    assert plan_n_files(128 * mb + 1, 128) == 2
    assert plan_n_files(10 * 128 * mb, 128) == 10
    with pytest.raises(ValueError, match="target_mb"):
        plan_n_files(1, 0)


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compacted")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.repartition(64).write.parquet(src)          # fragment: 64 tiny files
    n_in, bytes_in = dir_stats(spark, src)
    assert n_in == 64 and bytes_in > 0

    stats = compact_parquet(spark, src, dst, target_mb=128)
    assert stats["in_files"] == 64
    assert stats["out_files"] == 1                 # tiny table -> one file
    assert stats["layout"] == "roundrobin"
    assert stats["rows"] == ev.count()
    # exact multiset equality, order-insensitive
    assert _digest(spark.read.parquet(dst)) == _digest(ev)


def test_compact_zorder_layout_clusters_while_compacting(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "z")
    # replicate to >1 MB compressed so target_mb=1 (the floor) must plan
    # multiple output files; vary value per replica to defeat compression
    ev = (spark.read.parquet("/root/testdata/sf0.01/events.parquet")
          .select("event_id", "user_id", "value")
          .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(59))))
          .withColumn("value", F.col("value") + F.col("r") * 0.001)
          .drop("r"))
    ev.repartition(32).write.parquet(src)
    # force multiple output files so clustering is observable
    stats = compact_parquet(spark, src, dst, target_mb=1,
                            zorder_cols=["user_id", "value"])
    assert stats["layout"] == "zorder"
    assert stats["out_files"] >= 4
    assert _digest(spark.read.parquet(dst)) == _digest(ev)
    # clustering is real: per-file footer ranges narrow for at least one
    # of the z-ordered columns (full width logic lives in
    # test_zorder_layout; here we just gate that z-order was applied)
    import pyarrow.parquet as pq
    narrowed = False
    for col_idx in (1, 2):             # user_id, value
        widths = []
        for f in glob.glob(f"{dst}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = min(md.row_group(i).column(col_idx).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(col_idx).statistics.max
                     for i in range(md.num_row_groups))
            widths.append(hi - lo)
        if min(widths) < max(widths):
            narrowed = True
    assert narrowed                    # at least one column, one file


def test_compact_refuses_empty_dir(spark, tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no data files"):
        compact_parquet(spark, str(empty), str(tmp_path / "out"))
