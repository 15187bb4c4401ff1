"""Z-order layout: measured data-skipping effectiveness from the actual
parquet footers, not assumed."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pdf_parser_spark.sources.layout import zorder_layout


def _file_widths(path_glob: str, col: str) -> list[float]:
    """Per-file (max - min) of ``col`` from parquet footer statistics —
    exactly what a scan's row-group pruning consults."""
    widths = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        lo = min(_stat(md, i, col)[0] for i in range(md.num_row_groups))
        hi = max(_stat(md, i, col)[1] for i in range(md.num_row_groups))
        widths.append(float(hi) - float(lo))
    return widths


def _stat(md, rg: int, col: str):
    r = md.row_group(rg)
    for j in range(r.num_columns):
        c = r.column(j)
        if c.path_in_schema == col:
            return c.statistics.min, c.statistics.max
    raise KeyError(col)


def test_zorder_narrows_both_columns_file_ranges(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet") \
        .select("event_id", "user_id", "value")
    flat = str(tmp_path / "flat")
    zord = str(tmp_path / "zord")
    # unsorted baseline at the same file count
    ev.repartition(8).write.parquet(flat)
    zorder_layout(ev, ["user_id", "value"], n_files=8).write.parquet(zord)

    for col in ("user_id", "value"):
        wf = _file_widths(f"{flat}/part-*.parquet", col)
        wz = _file_widths(f"{zord}/part-*.parquet", col)
        # round-robin files each span ~the full domain; z-ordered files
        # must average substantially narrower on BOTH columns at once
        assert sum(wz) / len(wz) < 0.6 * (sum(wf) / len(wf)), (col, wz, wf)

    # and the rewrite is a permutation — no rows gained or lost
    a = spark.read.parquet(flat).agg(F.sum("event_id")).collect()[0][0]
    b = spark.read.parquet(zord).agg(F.sum("event_id")).collect()[0][0]
    assert a == b


def test_zorder_value_interleaves_bits(spark):
    from pdf_parser_spark.sources.layout import zorder_value
    df = spark.range(1).select(
        zorder_value([F.lit(0b10), F.lit(0b01)], bits=2).alias("z"))
    # MSB-first interleave of (10, 01) -> 1 0 0 1 = 9
    assert df.collect()[0].z == 9


def test_zorder_rejects_string_columns(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError, match="numeric/temporal"):
        zorder_layout(docs, ["text"])


def test_zorder_value_rejects_long_overflow(spark):
    import pytest
    from pdf_parser_spark.sources.layout import zorder_value

    with pytest.raises(ValueError, match="63"):
        zorder_value([F.lit(1)] * 8, bits=8)   # 64 bits would hit the sign
    docs = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError, match="63"):
        zorder_layout(docs, ["a", "b"], bits=32)


def test_zorder_rejects_all_null_column(spark):
    import pytest

    df = spark.createDataFrame([(1, None), (2, None)], "a int, b double")
    with pytest.raises(ValueError, match="entirely NULL"):
        zorder_layout(df, ["a", "b"])


def test_zorder_layout_is_session_state_invariant(spark, tmp_path):
    """The file cuts come from exact z-percentiles, not range sampling:
    the same input must produce byte-identical per-file footer stats no
    matter how the session is configured (the round-3 flake was
    repartitionByRange sampling drifting with shuffle/AQE state)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("event_id", "user_id", "value")
    stats = []
    for trial, (sp, mpb) in enumerate([("8", "128m"), ("64", "1m")]):
        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.shuffle.partitions", sp)
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
        try:
            out = str(tmp_path / f"z{trial}")
            zorder_layout(ev, ["user_id", "value"], n_files=4) \
                .write.parquet(out)
            per_file = []
            for col in ("user_id", "value"):
                per_file.append(tuple(_file_widths(f"{out}/part-*.parquet",
                                                   col)))
            stats.append(tuple(per_file))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
            spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
    assert stats[0] == stats[1]
