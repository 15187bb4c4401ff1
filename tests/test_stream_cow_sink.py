"""Streaming CDC apply onto the copy-on-write table: per-micro-batch
MERGE with last-wins collapse, ledger-backed exactly-once."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pdf_parser_spark.sources.cowtable import (create_table, merge_into,
                                               read_manifest, read_table)
from pdf_parser_spark.streaming.cow_sink import (collapse_last_wins,
                                                 merge_stream)

T0 = dt.datetime(2026, 1, 1)
CH_SCHEMA = "doc_id long, text string, op string, ts timestamp"


def _write(path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "op", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def _sec(s):
    return T0 + dt.timedelta(seconds=s)


def _base_table(spark, tmp_path):
    d = str(tmp_path / "table")
    base = spark.createDataFrame(
        [(i, f"row {i}") for i in range(20)], "doc_id long, text string")
    create_table(spark, base.repartitionByRange(3, "doc_id"), d, "doc_id")
    return d


def test_collapse_last_wins_semantics(spark):
    ch = spark.createDataFrame([
        (1, "first", "upsert", _sec(0)),
        (1, "last", "upsert", _sec(5)),          # later ts wins
        (2, "gone", "delete", _sec(1)),
        (3, "kept", "upsert", _sec(2)),
        (3, "tied-del", "delete", _sec(2)),      # exact tie: upsert wins
    ], CH_SCHEMA)
    out = {r.doc_id: (r.text, r.op)
           for r in collapse_last_wins(ch, "doc_id", "ts").collect()}
    assert out == {1: ("last", "upsert"), 2: ("gone", "delete"),
                   3: ("kept", "upsert")}


def test_stream_applies_batches_in_order(spark, tmp_path):
    table = _base_table(spark, tmp_path)
    inp = tmp_path / "cdc"
    inp.mkdir()
    # batch 1: update 0..2, delete 5; batch 2: re-update 1, insert 100;
    # within batch 1, key 0 changes twice -> last-wins
    _write(str(inp / "b1.parquet"), [
        (0, "stale", "upsert", _sec(0)),
        (0, "v1", "upsert", _sec(9)),
        (1, "v1", "upsert", _sec(1)),
        (2, "v1", "upsert", _sec(2)),
        (5, None, "delete", _sec(3)),
    ])
    _write(str(inp / "b2.parquet"), [
        (1, "v2", "upsert", _sec(20)),
        (100, "new", "upsert", _sec(21)),
    ])
    stream = (spark.readStream.schema(CH_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(str(inp)))
    q = merge_stream(stream, table, str(tmp_path / "ckpt"), order_col="ts")
    q.awaitTermination(180)

    got = {r.doc_id: r.text for r in read_table(spark, table).collect()}
    expected = {i: f"row {i}" for i in range(20)}
    expected.update({0: "v1", 1: "v2", 2: "v1", 100: "new"})
    del expected[5]
    assert got == expected
    m = read_manifest(table)
    assert m["version"] == 3                    # one snapshot per batch
    assert sorted(m["applied"]) == [0, 1]       # micro-batch ids ledgered


def test_redelivered_batch_is_noop(spark, tmp_path):
    table = _base_table(spark, tmp_path)
    ch = spark.createDataFrame(
        [(0, "v1", "upsert", _sec(0))], CH_SCHEMA).drop("ts")
    merge_into(spark, table, ch, batch_id=0)
    v = read_manifest(table)["version"]
    d = read_table(spark, table)
    n = d.count()
    # a foreachBatch replay delivers the SAME batch id again
    out = merge_into(spark, table, ch, batch_id=0)
    assert out["skipped"] is True
    assert read_manifest(table)["version"] == v
    assert read_table(spark, table).count() == n
    assert read_table(spark, table).where(
        (F.col("doc_id") == 0) & (F.col("text") == "v1")).count() == 1
