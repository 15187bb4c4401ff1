"""Streaming joins: stream-static enrichment and the watermarked
stream-stream interval join (bounded state via the time-range
predicate)."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_parser_spark.streaming.joins import (stream_enrich,
                                              stream_interval_join)

T0 = dt.datetime(2026, 1, 1)


def _write(path, cols, rows, mtime=None):
    df = pd.DataFrame(rows, columns=cols)
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    if mtime is not None:
        os.utime(path, (mtime, mtime))


def _sec(s):
    return T0 + dt.timedelta(seconds=s)


def test_stream_enrich_broadcasts_dimension(spark, tmp_path):
    inp = tmp_path / "ev"
    inp.mkdir()
    _write(str(inp / "f1.parquet"), ["user_id", "ts"],
           [("u1", _sec(0)), ("u2", _sec(1)), ("u9", _sec(2))])
    dim = spark.createDataFrame([("u1", "pro"), ("u2", "free")],
                                "user_id string, tier string")
    stream = (spark.readStream.schema("user_id string, ts timestamp")
              .parquet(str(inp)))
    q = (stream_enrich(stream, dim, "user_id")
         .writeStream.format("memory").queryName("enriched")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.user_id: r.tier
           for r in spark.sql("select * from enriched").collect()}
    # matches enriched, unmatched survives with null (left join)
    assert got == {"u1": "pro", "u2": "free", "u9": None}


def test_stream_interval_join_bounds_and_matches(spark, tmp_path):
    imp, clk = tmp_path / "imp", tmp_path / "clk"
    imp.mkdir()
    clk.mkdir()
    # impressions
    _write(str(imp / "f1.parquet"), ["user_id", "ts"],
           [("u1", _sec(0)), ("u2", _sec(0)), ("u3", _sec(0))])
    # clicks: u1 inside the 600s window, u2 exactly on the bound
    # (inclusive), u3 outside it, u4 with no impression at all
    _write(str(clk / "f1.parquet"), ["user_id", "ts"],
           [("u1", _sec(100)), ("u2", _sec(600)),
            ("u3", _sec(601)), ("u4", _sec(100))])
    left = (spark.readStream.schema("user_id string, ts timestamp")
            .parquet(str(imp)))
    right = (spark.readStream.schema("user_id string, ts timestamp")
             .parquet(str(clk)))
    joined = stream_interval_join(left, right, "user_id",
                                  max_delay="10 minutes")
    q = (joined.writeStream.format("memory").queryName("attributed")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from attributed").collect()
    got = {(r.user_id, r.ts, r.ts_r) for r in rows}
    assert got == {("u1", _sec(0), _sec(100)),
                   ("u2", _sec(0), _sec(600))}


def test_interval_join_batch_twin(spark):
    """The same function accepts bounded inputs — Spark defines batch
    join semantics as the watermark-free superset, which is the oracle
    for the streaming variant."""
    left = spark.createDataFrame([("u1", _sec(0))],
                                 "user_id string, ts timestamp")
    right = spark.createDataFrame(
        [("u1", _sec(100)), ("u1", _sec(999))],
        "user_id string, ts timestamp")
    got = stream_interval_join(left, right, "user_id",
                               max_delay="10 minutes").collect()
    assert [(r.user_id, r.ts_r) for r in got] == [("u1", _sec(100))]
