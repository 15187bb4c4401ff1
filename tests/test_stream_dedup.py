"""Streaming ingest dedup: cross-batch duplicate suppression with bounded
(watermark-aged) state."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_parser_spark.streaming.dedupe import stream_dedup

T0 = dt.datetime(2026, 1, 1)


def _write(path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def _sec(s):
    return T0 + dt.timedelta(seconds=s)


def test_cross_batch_duplicates_suppressed(spark, tmp_path):
    inp = tmp_path / "landing"
    inp.mkdir()
    _write(str(inp / "f1.parquet"), [
        ("a1", "alpha doc", _sec(0)),
        ("a2", "alpha doc", _sec(10)),      # in-batch duplicate
        ("b1", "beta doc", _sec(20)),
    ])
    _write(str(inp / "f2.parquet"), [
        ("a3", "alpha doc", _sec(100)),     # cross-batch dup (in horizon)
        ("c1", "gamma doc", _sec(120)),
    ])
    _write(str(inp / "f3.parquet"), [
        ("w", "watermark pusher", _sec(10_000)),
    ])

    stream = (spark.readStream
              .schema("doc_id string, text string, ts timestamp")
              .option("maxFilesPerTrigger", "1").parquet(str(inp)))
    q = (stream_dedup(stream, retention="1 hour")
         .writeStream.format("memory").queryName("deduped")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert not q.isActive
    got = {r.doc_id for r in spark.sql("select * from deduped").collect()}
    # exactly one survivor per distinct content, first arrival wins
    assert got == {"a1", "b1", "c1", "w"}
