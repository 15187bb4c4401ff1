"""Small-file compaction for parquet table directories.

The operational gap every long-lived 100 TB table hits: streaming
ingest, per-bucket resumable commits (sources/lineage.py), and
dynamic-partition overwrites all accrete SMALL files, and scan cost at
scale is dominated by file-open/footers once files fall under a few MB
(the classic small-file problem; Iceberg's `rewrite_data_files` /
Delta's OPTIMIZE exist for exactly this). This module is that rewrite
for plain parquet directories:

- file count is sized from the MEASURED input bytes (Hadoop FileSystem
  API — works for local, HDFS, and object stores alike) against a
  target file size, so output files land near the row-group sweet spot
  regardless of how fragmented the input was;
- the rewrite is ONE round-robin repartition (or, with ``zorder_cols``,
  the deterministic Z-curve layout of sources/layout.py, so compaction
  and clustering are one pass, not two);
- rows are preserved exactly (multiset equality pinned in tests) — the
  operator moves bytes, never answers.

Reference analog: none — the reference's corpus is 5 documents; this is
part of the operate-at-scale surface the task brief's 10^12-turn target
implies.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of a table directory, via the Hadoop
    FileSystem API (portable across local/HDFS/s3a), data files only."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    n_files = total = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):      # _SUCCESS, checksums, hidden
            continue
        n_files += 1
        total += st.getLen()
    return n_files, total


def plan_n_files(total_bytes: int, target_mb: int) -> int:
    """ceil(bytes / target) with a 1-file floor — compressed input bytes
    approximate compressed output bytes (same codec, same data)."""
    if target_mb < 1:
        raise ValueError(f"target_mb must be >= 1, got {target_mb}")
    return max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))


def compact_parquet(spark: SparkSession, src_dir: str, dst_dir: str, *,
                    target_mb: int = 128,
                    zorder_cols: list[str] | None = None,
                    zorder_bits: int = 4) -> dict:
    """Rewrite ``src_dir``'s parquet files into ``dst_dir`` at
    ~``target_mb`` per file. Returns the accounting dict (printed by the
    CLI): input/output file counts and bytes, rows, and the layout used.

    Without ``zorder_cols``: one round-robin repartition — pure
    bytes-motion, row order within files is not meaningful (none was
    promised). With ``zorder_cols``: the compaction IS the clustering
    rewrite (layout.zorder_layout), so footer-stats pruning comes out of
    the same single shuffle the compaction needed anyway.

    The write is all-or-nothing at the directory level
    (``mode("overwrite")`` to a NEW directory is the safe pattern;
    compact-in-place would destroy the source on a mid-write failure —
    callers swap directories/table pointers after success, the same
    commit discipline sources/stats_store.py uses).
    """
    in_files, in_bytes = dir_stats(spark, src_dir)
    if in_files == 0:
        raise ValueError(f"{src_dir} holds no data files to compact")
    n_out = plan_n_files(in_bytes, target_mb)
    df: DataFrame = spark.read.parquet(src_dir)
    if zorder_cols:
        from pdf_parser_spark.sources.layout import zorder_layout
        out = zorder_layout(df, zorder_cols, bits=zorder_bits,
                            n_files=n_out)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst_dir)
    out_files, out_bytes = dir_stats(spark, dst_dir)
    rows = spark.read.parquet(dst_dir).count()
    return {"src": src_dir, "dst": dst_dir,
            "in_files": in_files, "in_bytes": in_bytes,
            "out_files": out_files, "out_bytes": out_bytes,
            "rows": rows, "target_mb": target_mb,
            "layout": "zorder" if zorder_cols else "roundrobin"}
